"""Trainer — the ImagenTrainer-equivalent, mesh-native.

Capability parity (reference call sites, SURVEY.md §2.2):
  * per-unet Adam + EMA + grad clipping + mixed precision
    (/root/reference/train.py:124-128, train_ultra_res.py:109-115)
  * `train_step` / `valid_step` / `num_steps_taken` per unet_number
    (/root/reference/train.py:206-216)
  * grad-accumulation chunking à la `max_batch_size`
    (/root/reference/train_kumar.py:148)
  * `sample(...)` with EMA weights (/root/reference/train.py:230-238)
  * `save` / `load(noop_if_not_exist=True)` with step counters and
    optimizer/EMA state (/root/reference/train.py:188,245)
  * dataset attachment + cycling loaders
    (/root/reference/train.py:178-179)

TPU-native design: ONE jitted update step per stage; the batch is
sharded over the mesh "data" axis (XLA inserts the gradient all-reduce
over ICI — the DDP replacement); parameters are replicated or
FSDP-sharded over "model". There is no rank-aware code: one Python
process per host drives a global-semantics jit program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..cascade import Cascade
from ..parallel.mesh import (
    batch_sharding,
    fsdp_shardings,
    make_mesh,
    replicated_shardings,
)
from ..utils.checkpoint import checkpoint_exists, load_checkpoint, save_checkpoint

Array = jax.Array


from flax import struct


@struct.dataclass
class StageState:
    """All mutable training state for one cascade stage (a pure pytree)."""

    params: Any
    ema_params: Any
    opt_state: Any
    step: Array  # scalar int32


def _ema_update(ema, new, decay):
    return jax.tree.map(lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, new)


class Trainer:
    def __init__(
        self,
        cascade: Cascade,
        *,
        only_train_unet_number: Optional[int] = None,
        lr: float = 1e-4,
        eps: float = 1e-8,
        betas: tuple = (0.9, 0.99),
        max_grad_norm: Optional[float] = None,
        ema_decay: float = 0.9999,
        grad_accum_chunks: int = 1,
        mesh=None,
        fsdp: bool = False,
        seed: int = 0,
    ):
        self.cascade = cascade
        self.only_train_unet_number = only_train_unet_number
        self.lr, self.eps, self.betas = lr, eps, betas
        self.max_grad_norm = max_grad_norm
        self.ema_decay = ema_decay
        self.grad_accum_chunks = grad_accum_chunks
        self.mesh = mesh if mesh is not None else make_mesh(data=1, model=1, devices=jax.devices()[:1])
        self.fsdp = fsdp
        self._key = jax.random.PRNGKey(seed)
        self._states: Dict[int, StageState] = {}
        self._step_fns: Dict[int, Any] = {}
        self._valid_fns: Dict[int, Any] = {}
        self._train_iter: Optional[Iterator] = None
        self._valid_iter: Optional[Iterator] = None

    # ------------------------------------------------------------------
    # state management
    # ------------------------------------------------------------------

    def _next_key(self) -> Array:
        self._key, k = jax.random.split(self._key)
        return k

    def _optimizer(self):
        chain = []
        if self.max_grad_norm is not None:
            chain.append(optax.clip_by_global_norm(self.max_grad_norm))
        chain.append(
            optax.adam(self.lr, b1=self.betas[0], b2=self.betas[1], eps=self.eps)
        )
        return optax.chain(*chain)

    def state(self, unet_number: int) -> StageState:
        if unet_number not in self._states:
            self._init_stage(unet_number)
        return self._states[unet_number]

    def _init_stage(self, unet_number: int):
        if (
            self.only_train_unet_number is not None
            and unet_number != self.only_train_unet_number
        ):
            # mirror of the reference's FixedNullUnet guard: training a
            # stage this process doesn't own is a bug, fail loudly
            raise ValueError(
                f"trainer configured for stage {self.only_train_unet_number} "
                f"only, got stage {unet_number}"
            )
        params = self.cascade.init_stage_params(self._next_key(), unet_number)
        opt_state = self._optimizer().init(params)
        state = StageState(
            params=params,
            # explicit copy: astype(fp32) on fp32 params aliases the same
            # buffer, which breaks donation (same buffer donated twice)
            ema_params=jax.tree.map(lambda p: jnp.array(p, jnp.float32, copy=True), params),
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
        )
        self._states[unet_number] = self._place_state(state)

    def _place_state(self, state: StageState) -> StageState:
        """Move a stage state onto the mesh with the configured shardings."""
        shard_tree = (
            fsdp_shardings
            if (self.fsdp and self.mesh.shape.get("model", 1) > 1)
            else replicated_shardings
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        return StageState(
            params=jax.device_put(state.params, shard_tree(self.mesh, state.params)),
            ema_params=jax.device_put(
                state.ema_params, shard_tree(self.mesh, state.ema_params)
            ),
            opt_state=jax.device_put(
                state.opt_state, shard_tree(self.mesh, state.opt_state)
            ),
            step=jax.device_put(state.step, NamedSharding(self.mesh, P())),
        )

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _build_step_fn(self, unet_number: int):
        opt = self._optimizer()
        cascade = self.cascade
        chunks = self.grad_accum_chunks
        ema_decay = self.ema_decay

        def loss_fn(params, key, batch):
            return cascade.stage_loss(
                params,
                unet_number,
                key,
                batch["images"],
                text_embeds=batch.get("text_embeds"),
                cond_images=batch.get("cond_images"),
            )

        def step_fn(state: StageState, key: Array, batch: Dict[str, Array]):
            if chunks > 1:
                keys = jax.random.split(key, chunks)
                sub_batches = jax.tree.map(
                    lambda x: x.reshape((chunks, x.shape[0] // chunks) + x.shape[1:]),
                    batch,
                )

                def accum(carry, inp):
                    g_acc, l_acc = carry
                    k, sb = inp
                    l, g = jax.value_and_grad(loss_fn)(state.params, k, sb)
                    return (
                        jax.tree.map(jnp.add, g_acc, g),
                        l_acc + l,
                    ), None

                zero_g = jax.tree.map(jnp.zeros_like, state.params)
                (g_sum, l_sum), _ = jax.lax.scan(accum, (zero_g, 0.0), (keys, sub_batches))
                grads = jax.tree.map(lambda g: g / chunks, g_sum)
                loss = l_sum / chunks
            else:
                loss, grads = jax.value_and_grad(loss_fn)(state.params, key, batch)

            updates, opt_state = opt.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            # EMA with early-step warmup
            decay = jnp.minimum(
                ema_decay, (1.0 + state.step.astype(jnp.float32)) / (10.0 + state.step)
            )
            ema = _ema_update(state.ema_params, params, decay)
            return (
                StageState(params, ema, opt_state, state.step + 1),
                loss,
            )

        # batch arrives pre-placed with data-axis sharding (see _shard);
        # params/opt state carry their shardings — plain jit propagates both
        return jax.jit(step_fn, donate_argnums=(0,))

    def _build_valid_fn(self, unet_number: int):
        cascade = self.cascade

        def valid_fn(params, key, batch):
            return cascade.stage_loss(
                params,
                unet_number,
                key,
                batch["images"],
                text_embeds=batch.get("text_embeds"),
                cond_images=batch.get("cond_images"),
            )

        return jax.jit(valid_fn)

    # ------------------------------------------------------------------
    # public API (ImagenTrainer surface)
    # ------------------------------------------------------------------

    def train_step(self, unet_number: int, batch: Optional[Dict] = None) -> float:
        if batch is None:
            assert self._train_iter is not None, "no train dataset attached"
            batch = next(self._train_iter)
        batch = self._shard(batch)
        state = self.state(unet_number)
        if unet_number not in self._step_fns:
            self._step_fns[unet_number] = self._build_step_fn(unet_number)
        new_state, loss = self._step_fns[unet_number](state, self._next_key(), batch)
        self._states[unet_number] = new_state
        return float(loss)

    def valid_step(self, unet_number: int, batch: Optional[Dict] = None) -> float:
        if batch is None:
            assert self._valid_iter is not None, "no valid dataset attached"
            batch = next(self._valid_iter)
        batch = self._shard(batch)
        state = self.state(unet_number)
        if unet_number not in self._valid_fns:
            self._valid_fns[unet_number] = self._build_valid_fn(unet_number)
        return float(self._valid_fns[unet_number](state.params, self._next_key(), batch))

    def num_steps_taken(self, unet_number: int) -> int:
        if unet_number not in self._states:
            return 0
        return int(self._states[unet_number].step)

    def drop_state(self, unet_number: int) -> None:
        """Release a stage's device state (params/EMA/opt). The next
        access re-initialises it fresh. Frees HBM between checkpoint
        restores in eval sweeps — a 631M stage's state is ~10 GB and
        two cannot coexist on a 16 GB chip."""
        self._states.pop(int(unet_number), None)

    def sample(self, *, use_ema: bool = True, **kwargs):
        """Cascade sampling with (by default) EMA weights of every stage
        this trainer holds; mirrors `trainer.sample` using the EMA model."""
        params = []
        for n in range(1, self.cascade.config.num_stages + 1):
            if n in self._states:
                st = self._states[n]
                params.append(st.ema_params if use_ema else st.params)
            else:
                params.append(None)
        return self.cascade.sample(params, self._next_key(), **kwargs)

    # ------------------------------------------------------------------
    # datasets
    # ------------------------------------------------------------------

    def add_train_dataset(
        self,
        dataset,
        *,
        batch_size: int,
        shuffle: bool = True,
        device_pool: int = 0,
        pool_refresh_every: int = 0,
        **kw,
    ):
        """`device_pool=N` stages N batches on device once and cycles
        them (refreshing one slot every `pool_refresh_every` steps):
        per-step host->device uploads leak tunnel-client host RAM
        proportional to cumulative bytes on the tunneled TPU backend
        (two multi-hour runs wedged at RES 82-104 GB, round 4) — the
        pool bounds uploads so host RES stays flat over long runs."""
        from ..data.pipeline import DeviceBatchPool, make_loader

        self._train_iter = make_loader(
            dataset, batch_size=batch_size, shuffle=shuffle, seed=0, **kw
        )
        if device_pool:
            self._train_iter = DeviceBatchPool(
                self._train_iter, size=device_pool, place=self._shard,
                refresh_every=pool_refresh_every,
            )

    def add_valid_dataset(
        self,
        dataset,
        *,
        batch_size: int,
        shuffle: bool = False,
        device_pool: int = 0,
        pool_refresh_every: int = 0,
        **kw,
    ):
        from ..data.pipeline import DeviceBatchPool, make_loader

        self._valid_iter = make_loader(
            dataset, batch_size=batch_size, shuffle=shuffle, seed=1, **kw
        )
        if device_pool:
            self._valid_iter = DeviceBatchPool(
                self._valid_iter, size=device_pool, place=self._shard,
                refresh_every=pool_refresh_every,
            )

    def _shard(self, batch: Dict) -> Dict:
        sh = batch_sharding(self.mesh)
        nproc = jax.process_count()
        out = {}
        for k, v in batch.items():
            if v is None:
                continue
            if isinstance(v, jax.Array):
                # already placed (DeviceBatchPool batches are sharded at
                # staging time) — re-sharding would be a no-op at best
                # and a device->host round-trip at worst (multi-host)
                out[k] = v
                continue
            if self.mesh.size <= 1:
                out[k] = jnp.asarray(v)
            elif nproc > 1:
                # multi-host: each process holds a DIFFERENT local batch
                # (shard_by_process loader stripes); assemble the global
                # batch of size local*nproc from the per-host pieces —
                # a bare device_put would treat one host's rows as the
                # whole global array and silently drop the rest.
                # (np conversion only here — it needs host-local numpy)
                out[k] = jax.make_array_from_process_local_data(sh, np.asarray(v))
            else:
                out[k] = jax.device_put(jnp.asarray(v), sh)
        return out

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------

    @staticmethod
    def _state_dict(st: StageState) -> dict:
        # shallow: dataclasses.asdict would deep-copy the param trees
        return {
            "params": st.params,
            "ema_params": st.ema_params,
            "opt_state": st.opt_state,
            "step": st.step,
        }

    def save(self, path: str, *, ema_only: bool = False) -> None:
        """Persist all loaded stages. `ema_only` writes a SERVING
        checkpoint: just the EMA weights (+ step) per stage — 1/4 the
        bytes of the full train state, which matters at tunnel speeds
        (the 631M stage is ~2.5 GB EMA-only vs ~10 GB full). Samplers
        read only `.ema_params`; restore ema-only checkpoints with
        `load(..., partial=True)` (optionally merged after a full
        checkpoint, e.g. a distilled student overriding one stage)."""
        if ema_only:
            tree = {
                str(n): {"ema_params": st.ema_params, "step": st.step}
                for n, st in self._states.items()
            }
        else:
            tree = {str(n): self._state_dict(st) for n, st in self._states.items()}
        save_checkpoint(
            path,
            tree,
            metadata={
                "stages": sorted(self._states),
                "cascade": self.cascade.config.name,  # provenance
            },
        )

    def _abstract_state_dict(self, unet_number: int) -> dict:
        """Shape/dtype/sharding skeleton of a stage state, built WITHOUT
        materialising anything on device. Restoring into this instead of
        a freshly-initialised state halves peak HBM during `load`: for
        the 631M-param flagship stage, init(10 GB) + restore(10 GB)
        exceeds a 16 GB chip — measured as a RESOURCE_EXHAUSTED crash on
        resume (round 3). The shardings make Orbax create the restored
        arrays already placed, so `_place_state` is a no-op on them."""
        params = jax.eval_shape(
            lambda: self.cascade.init_stage_params(jax.random.PRNGKey(0), unet_number)
        )
        opt_state = jax.eval_shape(self._optimizer().init, params)
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard_tree = (
            fsdp_shardings
            if (self.fsdp and self.mesh.shape.get("model", 1) > 1)
            else replicated_shardings
        )

        def with_sharding(tree):
            return jax.tree.map(
                lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
                tree,
                shard_tree(self.mesh, tree),
            )

        return {
            "params": with_sharding(params),
            "ema_params": with_sharding(params),
            "opt_state": with_sharding(opt_state),
            "step": jax.ShapeDtypeStruct(
                (), jnp.int32, sharding=NamedSharding(self.mesh, P())
            ),
        }

    def load(self, path: str, *, noop_if_not_exist: bool = False, partial: bool = False) -> bool:
        if not checkpoint_exists(path):
            if noop_if_not_exist:
                return False
            raise FileNotFoundError(path)
        from ..utils.checkpoint import load_metadata

        stages = load_metadata(path).get("stages", [])
        if partial:
            # shape-tolerant restore keeps the CURRENT value of any leaf
            # the checkpoint can't fill -> those values must exist
            for n in stages:
                self.state(int(n))  # materialise target structure
        else:
            # a full restore REPLACES every leaf, so an already-loaded
            # stage state is dead weight during the restore — and for
            # the 631M flagship stage keeping it alive doubles peak HBM
            # past a 16 GB chip (e.g. eval loops loading checkpoint
            # after checkpoint into one trainer). Drop it and restore
            # into the abstract target below.
            for n in stages:
                self.drop_state(n)
        target = {str(n): self._state_dict(st) for n, st in self._states.items()}
        for n in stages:
            if str(n) not in target:
                target[str(n)] = self._abstract_state_dict(int(n))
        try:
            restored = load_checkpoint(path, target, partial=partial)
        except Exception as e:
            # the live states for `stages` were already dropped above; a
            # caller that catches this and keeps going would silently get
            # FRESH-INIT params from the next state() access — make the
            # hazard explicit in the error instead of letting a
            # checkpoint sweep record garbage without a trace
            raise RuntimeError(
                f"restore of {path} failed AFTER dropping live state for "
                f"stages {list(stages)}; those stages will re-initialise "
                "fresh on next access — do not keep using this trainer's "
                "old weights, they are gone"
            ) from e
        for n_str, d in restored.items():
            self._states[int(n_str)] = self._place_state(StageState(**d))
        return True

    # ------------------------------------------------------------------
    # rank-awareness no-ops (single-controller model)
    # ------------------------------------------------------------------

    @property
    def is_main(self) -> bool:
        return jax.process_index() == 0

    def wait_for_everyone(self) -> None:
        # single-controller JAX: nothing to synchronise on host
        pass

    def print(self, *args, **kwargs) -> None:
        if self.is_main:
            print(*args, **kwargs, flush=True)
