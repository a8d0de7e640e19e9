"""DistillTrainer — progressive-distillation phases on top of Trainer.

Usage (per stage): load a trained teacher checkpoint into the trainer,
then for each halving phase

    trainer.begin_phase(stage, num_student_steps=N)   # snapshot teacher
    for _ in range(steps):
        trainer.distill_step(stage)
    # student now samples well at N steps; next phase halves N again

`begin_phase` snapshots the current (by default EMA) weights as the
frozen teacher, keeps them as the student's initialisation
(arXiv:2202.00512 Algorithm 2), and re-initialises the optimizer. The
teacher pytree rides the jitted step as a plain argument — switching
phases never retraces except for the new static `num_student_steps`.

Kill/resume: `save`/`load` persist the student state (inherited). A
phase's teacher is the checkpoint written at phase start — harnesses
re-derive it on resume by loading that checkpoint and calling
`begin_phase(..., teacher_params=...)` (tools/distill_demo.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from .trainer import StageState, Trainer, _ema_update


class DistillTrainer(Trainer):
    def __init__(
        self,
        *args,
        teacher_cond_scale: float = 1.0,
        teacher_dtype: Optional[str] = None,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.teacher_cond_scale = teacher_cond_scale
        # "bfloat16" halves the frozen teacher's HBM footprint — the
        # model casts weights to its compute dtype (bf16) inside apply
        # anyway, so teacher forwards are numerically unchanged. Matters
        # on the 631M flagship stage: student state (params+EMA+Adam,
        # ~10 GB fp32) + an fp32 teacher would crowd a 16 GB chip.
        self.teacher_dtype = teacher_dtype
        self._teacher_params: Dict[int, Any] = {}
        self._phase_steps: Dict[int, int] = {}
        self._stage_scale: Dict[int, float] = {}  # per-phase CFG override
        self._distill_fns: Dict[int, Any] = {}  # one compiled step per stage

    # ------------------------------------------------------------------

    def begin_phase(
        self,
        unet_number: int,
        num_student_steps: int,
        *,
        teacher_params: Optional[Any] = None,
        teacher_from_ema: bool = True,
        teacher_cond_scale: Optional[float] = None,
    ) -> None:
        """Freeze the teacher and start a distillation phase targeting a
        `num_student_steps` sampling grid. The student continues from the
        teacher's weights; the optimizer restarts fresh.

        `teacher_cond_scale` overrides the trainer-level guidance scale
        for THIS phase. Guidance must be folded into the student in ONE
        phase (arXiv:2210.03142: distill the w-guided teacher, then
        progressive phases run unguided) — each phase's teacher is the
        previous student's EMA, so re-applying scale w every phase
        compounds it geometrically (w, w², ...; measured on the guided
        toy: 4 phases at scale 3 ⇒ saturated samples, FID 103.7 vs the
        guided anchor's 0.52). Pass the CFG scale for the first phase
        and 1.0 for the rest; a scale change recompiles the stage's
        distill step (one retrace per switch)."""
        if num_student_steps < 1:
            raise ValueError("num_student_steps must be >= 1")
        scale = (
            self.teacher_cond_scale
            if teacher_cond_scale is None
            else float(teacher_cond_scale)
        )
        if scale != self._stage_scale.get(unet_number, self.teacher_cond_scale):
            self._distill_fns.pop(unet_number, None)
        self._stage_scale[unet_number] = scale
        if teacher_params is None:
            st = self.state(unet_number)
            teacher_params = st.ema_params if teacher_from_ema else st.params
            st = None
        # Release the outgoing state (and any previous phase's teacher)
        # BEFORE allocating the phase's new one: on the 631M flagship
        # stage the old params+EMA+Adam state is ~10 GB and the new
        # state (+bf16 teacher) another ~11 GB — holding both while
        # optimizer.init runs OOMs a 16 GB chip. Only the teacher-source
        # pytree (one params copy) must stay live across the handoff.
        self._states.pop(unet_number, None)
        self._teacher_params.pop(unet_number, None)
        # fresh copies: the teacher is also the student's init, and EMA
        # buffers must not alias the live params (donation hazard)
        t_dtype = jnp.dtype(self.teacher_dtype) if self.teacher_dtype else jnp.float32
        teacher = jax.tree.map(lambda p: jnp.array(p, t_dtype, copy=True), teacher_params)
        params = jax.tree.map(
            lambda p: jnp.array(p, jnp.float32, copy=True), teacher_params
        )
        teacher_params = None  # drop our handle so the source can free
        self._teacher_params[unet_number] = teacher
        self._states[unet_number] = self._place_state(
            StageState(
                params=params,
                ema_params=jax.tree.map(lambda p: jnp.array(p, copy=True), params),
                opt_state=self._optimizer().init(params),
                # step restarts per phase: the EMA warmup
                # (decay = (1+step)/(10+step) capped at ema_decay) must
                # re-engage, or a phase inheriting a large step count runs
                # at decay 0.9999 from its first update and a ~500-step
                # phase leaves the EMA at the phase-START weights — the
                # next phase then re-distills the ORIGINAL teacher and the
                # final "student" is the teacher (measured: student-8 FID
                # == undistilled ddim-8 FID before this fix).
                # num_steps_taken consequently reports PHASE-local steps.
                step=jnp.zeros((), jnp.int32),
            )
        )
        self._phase_steps[unet_number] = int(num_student_steps)

    def phase_steps(self, unet_number: int) -> Optional[int]:
        return self._phase_steps.get(unet_number)

    # ------------------------------------------------------------------

    def _build_distill_fn(self, unet_number: int):
        opt = self._optimizer()
        cascade = self.cascade
        chunks = self.grad_accum_chunks
        ema_decay = self.ema_decay
        teacher_cond_scale = self._stage_scale.get(
            unet_number, self.teacher_cond_scale
        )

        def loss_fn(params, teacher, n_steps, key, batch):
            # harnesses may stage the batch pool in fp16 to halve its
            # HBM footprint; the loss math stays fp32 regardless
            return cascade.stage_distill_loss(
                params,
                teacher,
                unet_number,
                key,
                batch["images"].astype(jnp.float32),
                num_student_steps=n_steps,
                text_embeds=batch.get("text_embeds"),
                cond_images=batch.get("cond_images"),
                teacher_cond_scale=teacher_cond_scale,
            )

        # n_steps is a TRACED scalar: every halving phase reuses this one
        # compiled step (a retrace is minutes on the flagship stage)
        def step_fn(state: StageState, teacher, n_steps, key, batch):
            if chunks > 1:
                keys = jax.random.split(key, chunks)
                sub_batches = jax.tree.map(
                    lambda x: x.reshape((chunks, x.shape[0] // chunks) + x.shape[1:]),
                    batch,
                )

                def accum(carry, inp):
                    g_acc, l_acc = carry
                    k, sb = inp
                    l, g = jax.value_and_grad(loss_fn)(
                        state.params, teacher, n_steps, k, sb
                    )
                    return (jax.tree.map(jnp.add, g_acc, g), l_acc + l), None

                zero_g = jax.tree.map(jnp.zeros_like, state.params)
                (g_sum, l_sum), _ = jax.lax.scan(accum, (zero_g, 0.0), (keys, sub_batches))
                grads = jax.tree.map(lambda g: g / chunks, g_sum)
                loss = l_sum / chunks
            else:
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, teacher, n_steps, key, batch
                )

            updates, opt_state = opt.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            decay = jnp.minimum(
                ema_decay, (1.0 + state.step.astype(jnp.float32)) / (10.0 + state.step)
            )
            ema = _ema_update(state.ema_params, params, decay)
            return StageState(params, ema, opt_state, state.step + 1), loss

        return jax.jit(step_fn, donate_argnums=(0,))

    def distill_step(self, unet_number: int, batch: Optional[Dict] = None) -> float:
        if unet_number not in self._teacher_params:
            raise RuntimeError(
                f"no distillation phase active for stage {unet_number}; "
                "call begin_phase(stage, num_student_steps) first"
            )
        if batch is None:
            assert self._train_iter is not None, "no train dataset attached"
            batch = next(self._train_iter)
        batch = self._shard(batch)
        state = self.state(unet_number)
        if unet_number not in self._distill_fns:
            self._distill_fns[unet_number] = self._build_distill_fn(unet_number)
        new_state, loss = self._distill_fns[unet_number](
            state,
            self._teacher_params[unet_number],
            jnp.int32(self._phase_steps[unet_number]),
            self._next_key(),
            batch,
        )
        self._states[unet_number] = new_state
        return float(loss)
