"""Progressive distillation (core/distill.py, train/distill.py).

Pins the defining algebraic property of the distillation target
(arXiv:2202.00512 Algorithm 2): one student DDIM step whose x0
prediction equals the computed target lands EXACTLY on the teacher's
two-step output — plus trainer-level phase mechanics and end-to-end
sampling of a distilled student through the existing --ddim_steps path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kidney_diffusion_tpu.cascade import Cascade
from kidney_diffusion_tpu.core.distill import (
    ddim_step,
    distill_target_x0,
    progressive_distill_loss,
    student_time_grid,
)
from kidney_diffusion_tpu.core.schedules import GaussianDiffusion
from kidney_diffusion_tpu.models.configs import tiny_test_cascade
from kidney_diffusion_tpu.train import DistillTrainer


GD = GaussianDiffusion(num_timesteps=8)


def _toy_teacher(objective="v"):
    """Deterministic nonlinear 'model': pred depends on x and t."""

    def fn(x, t):
        tb = t.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.tanh(0.5 * x + 0.3 * tb) * 0.7

    return fn


class TestTargetInversion:
    def test_one_student_step_reproduces_two_teacher_steps(self):
        key = jax.random.PRNGKey(0)
        x_t = jax.random.normal(key, (3, 8, 8, 2))
        n = 4
        t = jnp.array([1.0, 0.5, 0.25])
        t_mid, t_next = t - 0.5 / n, t - 1.0 / n
        teacher = _toy_teacher()

        x0_tgt, z_next = distill_target_x0(
            GD, teacher, x_t, t, t_mid, t_next, teacher_objective="v"
        )

        # a student predicting exactly x0_tgt (x_start objective, no
        # clipping — the target inversion is clip-free on the student
        # side) must land on z_next in one step
        student = lambda x, tt: x0_tgt
        z_one = ddim_step(
            GD, student, x_t, t, t_next, objective="x_start", clip_x0=False
        )
        np.testing.assert_allclose(np.asarray(z_one), np.asarray(z_next), atol=1e-5)

    def test_target_has_no_gradient_into_teacher_inputs(self):
        # stop_gradient: distillation loss gradients must not flow
        # through the target (only through the student prediction)
        x_start = jnp.ones((2, 4, 4, 1)) * 0.3
        noise = jnp.zeros_like(x_start)

        def loss_of_student_scale(s):
            student = lambda x, t: s * jnp.ones_like(x)
            teacher = _toy_teacher()
            l = progressive_distill_loss(
                GD, teacher, student, x_start, jax.random.PRNGKey(1), noise,
                num_student_steps=4, teacher_objective="v", student_objective="x_start",
            )
            return jnp.sum(l)

        g = jax.grad(loss_of_student_scale)(1.0)
        assert np.isfinite(float(g)) and abs(float(g)) > 0

    def test_time_grid_on_student_lattice(self):
        t, t_mid, t_next = student_time_grid(jax.random.PRNGKey(2), 256, 8)
        # every t is i/8 with i in 1..8; t_next = t - 1/8 >= 0
        lattice = np.arange(1, 9) / 8.0
        assert np.all(np.isin(np.round(np.asarray(t) * 8) / 8, lattice))
        np.testing.assert_allclose(np.asarray(t - t_next), 1.0 / 8, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t - t_mid), 0.5 / 8, atol=1e-6)
        assert float(jnp.min(t_next)) >= -1e-6

    def test_truncated_snr_weight_matches_closed_form(self):
        # pointwise max(x0_err^2, snr*x0_err^2) == max(1, snr)*x0_err^2
        x_start = jax.random.normal(jax.random.PRNGKey(3), (4, 4, 4, 1))
        noise = jax.random.normal(jax.random.PRNGKey(4), x_start.shape)
        teacher = _toy_teacher()
        student = lambda x, t: jnp.zeros_like(x)
        l = progressive_distill_loss(
            GD, teacher, student, x_start, jax.random.PRNGKey(5), noise,
            num_student_steps=2, teacher_objective="v", student_objective="x_start",
        )
        t, t_mid, t_next = student_time_grid(jax.random.PRNGKey(5), 4, 2)
        x_t, _, alpha, sigma = GD.q_sample(x_start, t, noise)
        x0_tgt, _ = distill_target_x0(
            GD, teacher, x_t, t, t_mid, t_next, teacher_objective="v"
        )
        w = jnp.maximum(1.0, (alpha / sigma) ** 2)
        ref = jnp.mean(w * (0.0 - x0_tgt) ** 2, axis=(1, 2, 3))
        np.testing.assert_allclose(np.asarray(l), np.asarray(ref), rtol=1e-5)

    def test_noise_student_loss_is_eps_space(self):
        # an eps-parameterized student is scored on eps-space error
        # (== SNR * x0_err^2 algebraically — the stage's own training
        # weighting), NOT truncated-SNR, which diverges at t -> 1
        x_start = jax.random.normal(jax.random.PRNGKey(3), (4, 4, 4, 1))
        noise = jax.random.normal(jax.random.PRNGKey(4), x_start.shape)
        teacher = _toy_teacher()
        student = lambda x, t: jnp.zeros_like(x)
        l = progressive_distill_loss(
            GD, teacher, student, x_start, jax.random.PRNGKey(5), noise,
            num_student_steps=2, teacher_objective="noise",
            student_objective="noise",
        )
        t, t_mid, t_next = student_time_grid(jax.random.PRNGKey(5), 4, 2)
        x_t, _, alpha, sigma = GD.q_sample(x_start, t, noise)
        x0_tgt, _ = distill_target_x0(
            GD, teacher, x_t, t, t_mid, t_next, teacher_objective="noise"
        )
        eps_tgt = GD.predict_noise_from_start(x_t, t, x0_tgt)
        ref = jnp.mean((0.0 - eps_tgt) ** 2, axis=(1, 2, 3))
        np.testing.assert_allclose(np.asarray(l), np.asarray(ref), rtol=1e-5)

    def test_noise_student_loss_bounded_at_top_of_grid(self):
        # regression for the stage-1 phase-8 divergence (cascade distill
        # harness, 2026-08-19): at t = 1 the fp32 cosine schedule has
        # alpha ~ 4e-8, so the x0-space error of an eps student is the
        # eps error amplified ~2e7x — the truncated-SNR loss read 5.7e9
        # for an eps error of ~3e-3. num_student_steps=1 pins every
        # sample to t = 1, the worst case.
        x_start = jax.random.normal(jax.random.PRNGKey(8), (8, 4, 4, 1))
        noise = jax.random.normal(jax.random.PRNGKey(9), x_start.shape)
        teacher = _toy_teacher()
        # a slightly-off student: eps error is O(0.1), so the loss must
        # come back O(0.01), not O(1e12)
        student = lambda x, t: _toy_teacher()(x, t) + 0.1
        l = progressive_distill_loss(
            GD, teacher, student, x_start, jax.random.PRNGKey(10), noise,
            num_student_steps=1, teacher_objective="noise",
            student_objective="noise",
        )
        a = np.asarray(l)
        assert np.isfinite(a).all()
        assert a.max() < 10.0, a


@pytest.fixture(scope="module")
def cascade():
    return Cascade(tiny_test_cascade())


def _batch(key, b=4, size=32):
    return {"images": jax.random.uniform(key, (b, size, size, 3))}


class TestDistillTrainer:
    def test_phase_and_steps(self, cascade):
        tr = DistillTrainer(cascade, lr=1e-3)
        batch = _batch(jax.random.PRNGKey(0))
        # warm the stage with a couple of normal train steps first
        for _ in range(2):
            tr.train_step(2, batch)
        tr.begin_phase(2, 4)
        assert tr.phase_steps(2) == 4
        losses = [tr.distill_step(2, batch) for _ in range(4)]
        assert all(np.isfinite(l) for l in losses)
        # step restarts at phase entry (EMA warmup must re-engage —
        # see begin_phase), so the counter is phase-local
        assert tr.num_steps_taken(2) == 4

    def test_ema_tracks_student_within_phase(self, cascade):
        # regression: begin_phase must restart the EMA warmup. With the
        # inherited step counter the decay sat at 0.9999 and a short
        # phase's EMA stayed at the phase-start weights — the measured
        # symptom was distilled-student FID == undistilled-teacher FID.
        tr = DistillTrainer(cascade, lr=1e-2)
        batch = _batch(jax.random.PRNGKey(7))
        for _ in range(3):
            tr.train_step(2, batch)  # build up a nonzero step count
        tr.begin_phase(2, 4)
        assert tr.num_steps_taken(2) == 0
        start = jax.tree.map(lambda p: np.asarray(p).copy(), tr.state(2).ema_params)
        for _ in range(8):
            tr.distill_step(2, batch)
        deltas = jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
            tr.state(2).ema_params, start,
        )
        assert max(jax.tree.leaves(deltas)) > 1e-5

    def test_phase_halving_reuses_one_compiled_step(self, cascade):
        tr = DistillTrainer(cascade, lr=1e-3)
        batch = _batch(jax.random.PRNGKey(1))
        tr.begin_phase(2, 8)
        l8 = tr.distill_step(2, batch)
        tr.begin_phase(2, 4)
        l4 = tr.distill_step(2, batch)
        assert np.isfinite(l8) and np.isfinite(l4)
        assert tr.phase_steps(2) == 4
        # N rides the jitted step as a traced scalar: both phases share
        # one executable (a retrace is minutes on the flagship stage)
        assert len(tr._distill_fns) == 1

    def test_explicit_teacher_params_resume_path(self, cascade):
        tr = DistillTrainer(cascade, lr=1e-3)
        st = tr.state(2)
        frozen = jax.tree.map(lambda p: p * 1.0, st.ema_params)
        tr.begin_phase(2, 4, teacher_params=frozen)
        l = tr.distill_step(2, _batch(jax.random.PRNGKey(2)))
        assert np.isfinite(l)

    def test_distill_step_requires_phase(self, cascade):
        tr = DistillTrainer(cascade)
        with pytest.raises(RuntimeError, match="begin_phase"):
            tr.distill_step(1, _batch(jax.random.PRNGKey(3)))

    def test_grad_accum_chunks(self, cascade):
        tr = DistillTrainer(cascade, lr=1e-3, grad_accum_chunks=2)
        tr.begin_phase(1, 4)
        l = tr.distill_step(1, _batch(jax.random.PRNGKey(4)))
        assert np.isfinite(l)

    def test_distilled_student_samples_via_ddim_path(self, cascade):
        tr = DistillTrainer(cascade, lr=1e-3)
        tr.begin_phase(1, 4)
        tr.begin_phase(2, 4)
        batch = _batch(jax.random.PRNGKey(5))
        for _ in range(2):
            tr.distill_step(1, batch)
            tr.distill_step(2, batch)
        out = tr.sample(batch_size=2, ddim_steps=4)
        assert out.shape == (2, 32, 32, 3)
        a = np.asarray(out)
        assert np.isfinite(a).all() and a.min() >= 0.0 and a.max() <= 1.0

    def test_data_parallel_distill_parity(self, cascade):
        """Same correctness property as the train-step dp parity test
        (tests/test_trainer.py): an 8-device data-parallel distill step
        on a global batch equals the single-device step — losses and
        updated params/EMA match to reduction-order tolerance."""
        from kidney_diffusion_tpu.parallel.mesh import make_mesh

        def run(mesh):
            tr = DistillTrainer(
                cascade, mesh=mesh, lr=1e-3, max_grad_norm=1.0, seed=11
            )
            tr.begin_phase(2, 8)
            losses = [
                tr.distill_step(2, _batch(jax.random.PRNGKey(s), b=8))
                for s in range(3)
            ]
            return tr, losses

        tr1, l1 = run(make_mesh(data=1, model=1, devices=jax.devices()[:1]))
        tr8, l8 = run(make_mesh(data=8, model=1))
        np.testing.assert_allclose(l1, l8, atol=1e-5)
        for a, b in zip(
            jax.tree.leaves(tr1.state(2).params), jax.tree.leaves(tr8.state(2).params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
        for a, b in zip(
            jax.tree.leaves(tr1.state(2).ema_params),
            jax.tree.leaves(tr8.state(2).ema_params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)

    def test_phase_scale_override_matches_unguided_trainer(self):
        """begin_phase(teacher_cond_scale=1.0) on a guided trainer must
        reproduce an unguided trainer exactly — guidance folds into the
        student in ONE phase (arXiv:2210.03142); later phases re-applying
        the scale compound it geometrically (measured: FID 103.7 vs the
        guided anchor's 0.52 on the guided toy)."""
        cc = tiny_test_cascade(condition_on_text=True)
        b = {
            "images": jax.random.uniform(jax.random.PRNGKey(20), (2, 16, 16, 3)),
            "text_embeds": jnp.eye(2, 3)[:, None, :],
        }

        def one_step(scale, override):
            tr = DistillTrainer(
                Cascade(cc), lr=1e-2, seed=5, teacher_cond_scale=scale
            )
            # a couple of real train steps: at FRESH init the cross-attn
            # output projection is zero-initialised, cond == uncond
            # exactly, and guidance is a no-op — the comparison below
            # would be vacuous
            for _ in range(3):
                tr.train_step(1, b)
            tr.begin_phase(1, 4, teacher_cond_scale=override)
            return tr.distill_step(1, b)

        l_guided_trainer_overridden = one_step(3.0, 1.0)
        l_unguided_trainer = one_step(1.0, None)
        l_guided = one_step(3.0, None)
        assert l_guided_trainer_overridden == pytest.approx(
            l_unguided_trainer, abs=1e-6
        )
        # and the guided teacher is genuinely different math
        assert abs(l_guided - l_unguided_trainer) > 1e-7

    def test_scale_switch_invalidates_compiled_step(self):
        cc = tiny_test_cascade(condition_on_text=True)
        tr = DistillTrainer(Cascade(cc), lr=1e-3, teacher_cond_scale=3.0)
        b = {
            "images": jax.random.uniform(jax.random.PRNGKey(21), (2, 16, 16, 3)),
            "text_embeds": jnp.eye(2, 3)[:, None, :],
        }
        tr.begin_phase(1, 4)
        tr.distill_step(1, b)
        fn_guided = tr._distill_fns[1]
        tr.begin_phase(1, 2, teacher_cond_scale=1.0)
        tr.distill_step(1, b)
        assert tr._distill_fns[1] is not fn_guided
        # same scale again: the compiled step is reused
        fn_unguided = tr._distill_fns[1]
        tr.begin_phase(1, 1, teacher_cond_scale=1.0)
        tr.distill_step(1, b)
        assert tr._distill_fns[1] is fn_unguided

    def test_edm_stage_distillation_raises_loudly(self):
        # stage_distill_loss math lives on the log-SNR DDIM grid; an EDM
        # stage sampling via churn-Heun would be silently mis-distilled
        from kidney_diffusion_tpu.models.configs import elucidated

        cc = elucidated(
            tiny_test_cascade(image_sizes=(16, 32), timesteps=8),
            num_sample_steps=(6, 6, 6), sigma_max=(80.0, 320.0, 320.0),
        )
        tr = DistillTrainer(Cascade(cc), lr=1e-3)
        tr.begin_phase(1, 4)
        with pytest.raises(NotImplementedError, match="EDM"):
            tr.distill_step(
                1,
                {"images": jax.random.uniform(
                    jax.random.PRNGKey(12), (2, 16, 16, 3))},
            )

    def test_guidance_distillation_builds_cfg_teacher(self):
        cc = tiny_test_cascade(condition_on_text=True)
        c = Cascade(cc)
        tr = DistillTrainer(c, lr=1e-3, teacher_cond_scale=3.0)
        tr.begin_phase(1, 4)
        b = {
            "images": jax.random.uniform(jax.random.PRNGKey(6), (2, 16, 16, 3)),
            "text_embeds": jnp.zeros((2, 1, 3)),
        }
        l = tr.distill_step(1, b)
        assert np.isfinite(l)
