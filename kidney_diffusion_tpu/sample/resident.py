"""Device-resident transport for the gigapixel orchestrator.

The uint8-wire path (sample/gigapixel.py) still moves ~10 MB per 1024²
patch over the host<->device link: the recentered cond crop (~3 MB) and
RePaint strips (~4 MB) up, the finished patch (~3 MB) down — and over
the axon tunnel that traffic, not the denoise compute, dominates
end-to-end wall clock (artifacts/r3_gigapixel_wall: warm 0.86
patches/sec vs 3.0 device-only).

This engine keeps the whole level device-resident instead:

  * the coarse canvas is encoded uint8 and uploaded ONCE (padded with
    the fill value so every recentered crop is an in-bounds
    `lax.dynamic_slice` — identical to gigapixel.crop_with_fill,
    /root/reference/sample_ultra_res.py:358-391);
  * per-chunk conditioning (cond crops, lowres from the previous-stage
    store, overlap strips from neighbour patches with the coarse-image
    fallback and the diagonal corner quirk of
    /root/reference/sample_ultra_res.py:125-174) is assembled by ONE
    jitted prep call whose inputs are device arrays — nothing crosses
    the link;
  * stage outputs stay on device (uint8), split into per-patch handles
    inside the sampling dispatch (Cascade.sample_stage output_split);
  * only final-stage patches come back to host — fetched by a
    background thread that overlaps the download with the next patches'
    compute, with device entries freed once no later patch reads their
    strips (exact last-consumer-wave accounting, not a fixed window).

Numerics match the uint8 wire path: all transported images are
quantized to 1/255 at the same points, so `wire="resident"` and
`wire="uint8"` produce identical guidance up to the bilinear-resize
implementation in the (rare) coarse-strip fallback.
"""

from __future__ import annotations

import functools
import queue
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .wavefront import Pos, deps


def _nearest_idx(out_size: int, in_size: int) -> jnp.ndarray:
    """Index map of the half-pixel nearest resize (same formula as
    data/wsi.resize_nearest and the in-model jax.image.resize)."""
    return jnp.clip(
        ((jnp.arange(out_size) + 0.5) * in_size / out_size).astype(jnp.int32),
        0,
        in_size - 1,
    )


def last_use_waves(waves: Sequence[Sequence[Pos]], orientation: int) -> Dict[Pos, int]:
    """pos -> index of the last wave whose patches read pos as a strip
    neighbour. Eviction after that wave is exact even for irregular
    (tissue-filtered) patch sets where a dependency can finish many
    waves before its consumer runs."""
    last: Dict[Pos, int] = {}
    for wi, wave in enumerate(waves):
        for pos in wave:
            for d in deps(pos, orientation):
                last[d] = max(last.get(d, -1), wi)
    return last


class ResidentEngine:
    """Per-level device-resident state: padded canvas (or cond stack),
    jitted prep cache, background output fetcher."""

    def __init__(
        self,
        *,
        patch_size: int,
        grid,
        orientation: int,
        canvas: Optional[np.ndarray] = None,
        cond_stack: Optional[np.ndarray] = None,
        patch_pos: Optional[Sequence[Pos]] = None,
        fill: float = 0.95,
        center_cond: bool = False,
        store_dtype=np.float16,
    ) -> None:
        self.ps = patch_size
        self.grid = grid
        self.orientation = orientation
        self.center_cond = center_cond
        self.store_dtype = store_dtype
        self.mode: Optional[str] = None
        self.P = None  # canvas mode: padded uint8 canvas on device
        self.stack = None  # stack mode: uint8 cond stack on device
        self._pos_index: Dict[Pos, int] = {}

        if canvas is not None:
            pad_lo = patch_size // 2
            # the last grid row/col can overhang the canvas by up to one
            # stride; pad the high side a full patch so every crop (cond
            # AND coarse-strip fallback) stays in bounds of dynamic_slice
            pad_hi = patch_size
            c8 = np.clip(np.round(canvas[..., :3] * 255.0), 0, 255).astype(np.uint8)
            fill8 = int(np.clip(round(fill * 255.0), 0, 255))
            P = np.full(
                (c8.shape[0] + pad_lo + pad_hi, c8.shape[1] + pad_lo + pad_hi, 3),
                fill8,
                np.uint8,
            )
            P[pad_lo : pad_lo + c8.shape[0], pad_lo : pad_lo + c8.shape[1]] = c8
            self.P = jnp.asarray(P)
            self.mode = "canvas"
        elif cond_stack is not None:
            s = cond_stack
            if s.dtype != np.uint8:
                s = np.clip(np.round(s.astype(np.float32) * 255.0), 0, 255).astype(
                    np.uint8
                )
            self.stack = jnp.asarray(s)
            self._pos_index = {pos: k for k, pos in enumerate(patch_pos or [])}
            self.mode = "stack"

        self._zeros_cache: Dict[int, jnp.ndarray] = {}

        self.final_host: Dict[Pos, np.ndarray] = {}
        self._fetch_errors: List[BaseException] = []
        self._q: "queue.Queue" = queue.Queue()
        self._discard = False  # set by shutdown(): skip pending fetches
        self._final_pending: List[Tuple[Pos, object]] = []
        import os as _os

        self.fetch_batch = max(
            1, int(_os.environ.get("KDT_RESIDENT_FETCH_BATCH", "8"))
        )
        self._fetcher = threading.Thread(target=self._fetch_loop, daemon=True)
        self._fetcher.start()

    # ------------------------------------------------------------------
    # background download of finished patches
    # ------------------------------------------------------------------

    def _fetch_loop(self) -> None:
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                if self._discard:
                    # cleanup path: skip the device->host download of
                    # already-queued buffers — on the error path each is
                    # a multi-second wasted tunnel transfer (ADVICE r4)
                    continue
                pos, arr = item
                host = np.asarray(arr)
                if self.store_dtype != np.uint8:
                    host = (host.astype(np.float32) / 255.0).astype(
                        self.store_dtype
                    )
                # else: store the wire uint8 [0,255] directly — the
                # float round-trip costs real host CPU at full-slide
                # scale (1089 x 3 MB patches serialized in this thread)
                # and the stitch re-quantizes to uint8 anyway
                if isinstance(pos, list):
                    # batched fetch: one device->host round trip carries
                    # fetch_batch patches (full-slide measurement: the
                    # per-fetch round trip, not payload, dominated the
                    # post-dispatch drain)
                    for p, row in zip(pos, host):
                        self.final_host[p] = row
                else:
                    self.final_host[pos] = host
            except BaseException as e:  # surfaced in finish()
                self._fetch_errors.append(e)
            finally:
                self._q.task_done()

    def enqueue_final(self, pos: Pos, arr) -> None:
        """Hand a finished final-stage patch to the background fetcher.
        Patches accumulate into groups of `fetch_batch` that are
        device-stacked (one tiny dispatch) and downloaded in ONE round
        trip: at full-slide scale per-fetch round-trip latency dominated
        the drain (1089 single fetches ≈ 12 min after the last dispatch,
        artifacts/r5_gigapixel_fullscale cold run)."""
        self._final_pending.append((pos, arr))
        if len(self._final_pending) >= self.fetch_batch:
            self._flush_finals()

    def _flush_finals(self) -> None:
        pending, self._final_pending = self._final_pending, []
        if not pending:
            return
        if len(pending) == 1:
            self._q.put(pending[0])
        else:
            self._q.put((
                [p for p, _ in pending],
                jnp.stack([a for _, a in pending]),
            ))

    def finish(self) -> Dict[Pos, np.ndarray]:
        """Drain the fetcher and return the host-side final patches."""
        self._flush_finals()
        self._q.join()
        self.shutdown()
        if self._fetch_errors:
            raise self._fetch_errors[0]
        return self.final_host

    def shutdown(self) -> None:
        """Stop the fetcher thread without raising. Idempotent — the
        error-path cleanup (generate_patch_set's finally) so a failed
        level never leaks a daemon thread + its queued device buffers
        into a long-lived serving process. Pending queue items are
        DISCARDED, not downloaded: the sentinel rides at the queue tail,
        so without the flag the fetcher would finish fetching every
        already-queued buffer before exiting — seconds of wasted tunnel
        downloads after a failure. (`finish()` joins the queue BEFORE
        calling this, so the success path never discards anything.)"""
        if self._fetcher.is_alive():
            self._discard = True
            self._q.put(None)
            self._fetcher.join()

    def __enter__(self) -> "ResidentEngine":
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()

    # ------------------------------------------------------------------
    # device-side helpers
    # ------------------------------------------------------------------

    def _zeros(self, size: int):
        if size not in self._zeros_cache:
            self._zeros_cache[size] = jnp.zeros((size, size, 3), jnp.uint8)
        return self._zeros_cache[size]

    def center(self, pos: Pos) -> Tuple[int, int]:
        i, j = pos
        return (
            i * self.grid.patch_dist + self.grid.patch_width // 2,
            j * self.grid.patch_dist + self.grid.patch_width // 2,
        )

    def seed_center_crops(self, patch_pos: Sequence[Pos]):
        """--ignore_unet_1 seeding: the patch_width² center crop of every
        cond image as a device uint8 array per pos
        (/root/reference/sample_ultra_res.py:418-421)."""
        pw = self.grid.patch_width
        fn = _seed_program(self.mode, self.ps, pw)
        if self.mode == "canvas":
            # cond[u] = P[cy + u]; the center crop starts at
            # u = ps//2 - pw//2  ->  P row cy + ps//2 - pw//2
            arg = np.asarray(
                [
                    (cy + self.ps // 2 - pw // 2, cx + self.ps // 2 - pw // 2)
                    for cy, cx in (self.center(p) for p in patch_pos)
                ],
                np.int32,
            )
            return dict(zip(patch_pos, fn(self.P, arg)))
        assert self.mode == "stack"
        arg = np.asarray([self._pos_index[p] for p in patch_pos], np.int32)
        return dict(zip(patch_pos, fn(self.stack, arg)))

    # ------------------------------------------------------------------
    # per-chunk conditioning assembly (one dispatch)
    # ------------------------------------------------------------------

    def _assemble_chunk(
        self,
        chunk: Sequence[Pos],
        stage_size: int,
        stores_stage: Dict[Pos, object],
        lowres_store: Optional[Dict[Pos, object]],
        bsz: int,
        need_cond: bool,
    ):
        """Host-side packing for one wave chunk: the (B, 12) int32 meta
        array (crop starts, neighbour kinds, coarse-fallback coords — one
        upload; per-transfer latency on tiny arrays costs more than their
        bytes), neighbour-strip device handles, and lowres handles."""
        g = self.grid
        ov = int(g.overlap * stage_size)
        n = g.num_patches_width
        ori = self.orientation
        zero = self._zeros(stage_size)

        meta = np.zeros((bsz, 12), np.int32)
        slot_arrs: List[List[object]] = [[], [], []]
        lr_arrs: List[object] = []
        fallback_ok = self.mode is not None and need_cond
        any_strip = False

        for b, (i, j) in enumerate(chunk):
            cy, cx = self.center((i, j))
            meta[b, 0:2] = (cy, cx)
            if self.mode == "stack":
                meta[b, 2] = self._pos_index[(i, j)]
            nj = j + ori
            neighbors = ((i - 1, j), (i, nj), (i - 1, nj))
            valid = (i > 0, 0 <= nj < n, i > 0 and 0 <= nj < n)
            for s in range(3):
                npos, ok = neighbors[s], valid[s]
                arr = zero
                if ok and ov > 0 and npos in stores_stage:
                    meta[b, 3 + s] = 1
                    arr = stores_stage[npos]
                    any_strip = True
                elif ok and ov > 0 and fallback_ok:
                    ni, njj = npos
                    top_y = self.ps // 2 - g.patch_width // 2 + (ni - i) * g.patch_dist
                    top_x = self.ps // 2 - g.patch_width // 2 + (njj - j) * g.patch_dist
                    if (
                        0 <= top_y
                        and 0 <= top_x
                        and top_y + g.patch_width <= self.ps
                        and top_x + g.patch_width <= self.ps
                    ):
                        meta[b, 3 + s] = 2
                        any_strip = True
                        if self.mode == "canvas":
                            # cond[u, v] = P[cy + u, cx + v]
                            meta[b, 6 + 2 * s : 8 + 2 * s] = (cy + top_y, cx + top_x)
                        else:
                            meta[b, 6 + 2 * s : 8 + 2 * s] = (top_y, top_x)
                slot_arrs[s].append(arr)
            if lowres_store is not None:
                lr_arrs.append(lowres_store[(i, j)])

        # pad to the bucket size by repeating the last element (same
        # semantics as gigapixel._pad_to)
        for b in range(len(chunk), bsz):
            meta[b] = meta[len(chunk) - 1]
            for s in range(3):
                slot_arrs[s].append(slot_arrs[s][len(chunk) - 1])
            if lr_arrs:
                lr_arrs.append(lr_arrs[-1])
        return meta, slot_arrs, lr_arrs, any_strip

    def _prep_statics(self, any_strip: bool, need_cond: bool, has_lr: bool):
        return (
            self.ps,
            self.grid.patch_width,
            float(self.grid.overlap),
            self.orientation,
            self.mode,
            bool(need_cond),
            bool(has_lr),
            bool(any_strip),
            self.center_cond,
        )

    def prep_chunk(
        self,
        chunk: Sequence[Pos],
        stage_size: int,
        stores_stage: Dict[Pos, object],
        lowres_store: Optional[Dict[Pos, object]],
        bsz: int,
        *,
        need_cond: bool,
    ) -> dict:
        """Build sample_stage kwargs (device arrays) for one wave chunk
        — ONE prep dispatch, followed by the caller's sampling dispatch.
        (The fused path below folds both into one program; this entry
        stays for the mesh path and for direct parity tests.)"""
        meta, slot_arrs, lr_arrs, any_strip = self._assemble_chunk(
            chunk, stage_size, stores_stage, lowres_store, bsz, need_cond
        )
        fn = _prep_program(*self._prep_statics(any_strip, need_cond, bool(lr_arrs)))
        src = self.P if self.mode == "canvas" else self.stack
        out = fn(
            src,
            meta,
            tuple(tuple(s) for s in slot_arrs) if any_strip else (),
            tuple(lr_arrs),
        )
        kwargs = {}
        if need_cond:
            kwargs["cond_images"] = out["cond"]
        if lr_arrs:
            kwargs["lowres_image"] = out["lowres"]
        if any_strip:
            kwargs["inpaint_images"] = out["inpaint"]
            kwargs["inpaint_masks"] = out["masks"]
        return kwargs

    def sample_chunk(
        self,
        cascade,
        params,
        stage: int,
        key,
        chunk: Sequence[Pos],
        stage_size: int,
        stores_stage: Dict[Pos, object],
        lowres_store: Optional[Dict[Pos, object]],
        bsz: int,
        *,
        need_cond: bool,
        inpaint_resample_times: int = 1,
        use_ddim: bool = False,
        ddim_steps: int = 0,
        dpmpp_steps: int = 0,
        scan: bool = False,
    ) -> tuple:
        """FUSED conditioning-prep + stage sampling: one dispatch per
        chunk. On the attached-tunnel topology each dispatch costs
        ~0.2 s regardless of size (PERF.md round 4: ~350 dispatches were
        ~70 s of the 112 s mag-2 wall) — folding the prep program into
        the sampling program halves the per-chunk dispatch count with
        zero compute penalty. Numerically identical to
        prep_chunk + Cascade.sample_stage: the fused program contains
        exactly the same ops feeding the same impl with the same key
        (pinned by test_resident_fused_equals_unfused).

        `scan=True` (the full-slide lever, round 5): the chunk's patches
        run SEQUENTIALLY at batch 1 inside one `lax.scan` program — the
        per-patch compute of the measured batch-1 optimum for >256²
        stages (batch 2 is 1.37x slower per patch) with the dispatch
        count of a batched wave. At full-slide scale the per-dispatch
        tunnel cost dominates the 1024² stage (~0.3 s of the 0.52
        s/patch cold wall, artifacts/r5_gigapixel_fullscale), so one
        dispatch per wave-chunk instead of one per patch is the
        difference between ~0.4 and >1 patches/sec end-to-end. Patches
        within a wave have no mutual deps (the wavefront invariant), so
        every strip the scan body reads comes from earlier waves' device
        store — same values the per-patch path would read. The RNG
        stream differs from the per-patch path (keys are carry-split
        inside the scan), equally valid draws."""
        meta, slot_arrs, lr_arrs, any_strip = self._assemble_chunk(
            chunk, stage_size, stores_stage, lowres_store, bsz, need_cond
        )
        statics = self._prep_statics(any_strip, need_cond, bool(lr_arrs))
        resample = inpaint_resample_times if any_strip else 1
        fused_key = (
            "resident_fused", stage, bsz, stage_size, statics,
            resample, use_ddim, ddim_steps, dpmpp_steps, scan,
        )
        cache = cascade.__dict__.setdefault("_resident_fused_cache", {})
        if fused_key not in cache:
            prep_fn = _make_prep_fn(*statics)
            kw_names = []
            if need_cond:
                kw_names.append(("cond", "cond_images"))
            if lr_arrs:
                kw_names.append(("lowres", "lowres_image"))
            if any_strip:
                kw_names.append(("inpaint", "inpaint_images"))
                kw_names.append(("masks", "inpaint_masks"))

            def sample_one(params, key, out_prep, batch):
                kwargs = {dst: out_prep[k] for k, dst in kw_names}
                return cascade._sample_stage_impl(
                    params,
                    stage,
                    key,
                    batch_size=batch,
                    inpaint_resample_times=resample,
                    use_ddim=use_ddim,
                    ddim_steps=ddim_steps,
                    dpmpp_steps=dpmpp_steps,
                    output_dtype="uint8",
                    **kwargs,
                )

            if scan:

                def fused(params, key, src, meta, slots, lr_list):
                    xs = {"m": meta}
                    if slots:
                        xs["s"] = tuple(jnp.stack(s) for s in slots)
                    if lr_list:
                        xs["lr"] = jnp.stack(lr_list)

                    def body(carry, x):
                        carry, k_i = jax.random.split(carry)
                        out_prep = prep_fn(
                            src,
                            x["m"][None],
                            tuple((s,) for s in x["s"]) if "s" in x else (),
                            (x["lr"],) if "lr" in x else (),
                        )
                        res = sample_one(params, k_i, out_prep, 1)
                        return carry, res[0]

                    _, outs = jax.lax.scan(body, key, xs)
                    return tuple(outs[k] for k in range(bsz))

            else:

                def fused(params, key, src, meta, slots, lr_list):
                    out_prep = prep_fn(src, meta, slots, lr_list)
                    res = sample_one(params, key, out_prep, bsz)
                    return tuple(res[k] for k in range(bsz))

            cache[fused_key] = jax.jit(fused)
        src = self.P if self.mode == "canvas" else self.stack
        return cache[fused_key](
            params,
            key,
            src,
            meta,
            tuple(tuple(s) for s in slot_arrs) if any_strip else (),
            tuple(lr_arrs),
        )


# ---------------------------------------------------------------------------
# jitted programs — module-level and lru-cached so every engine (one per
# magnification level / cold+warm pass) reuses the same traced function
# objects; shapes (batch, stage size, lowres size) retrace under the same
# jit, and the persistent XLA cache dedupes actual compiles
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _seed_program(mode: Optional[str], ps: int, pw: int):
    if mode == "canvas":

        def fn(src, starts):
            def one(st):
                return jax.lax.dynamic_slice(
                    src, (st[0], st[1], jnp.int32(0)), (pw, pw, 3)
                )

            out = jax.vmap(one)(starts)
            return tuple(out[k] for k in range(starts.shape[0]))

    else:
        y0 = (ps - pw) // 2

        def fn(src, idx):
            out = src[idx, y0 : y0 + pw, y0 : y0 + pw, :3]
            return tuple(out[k] for k in range(idx.shape[0]))

    return jax.jit(fn)


def _make_prep_fn(
    ps: int,
    pw: int,
    overlap: float,
    ori: int,
    mode: Optional[str],
    need_cond: bool,
    has_lr: bool,
    any_strip: bool,
    center_cond: bool,
):
    def fn(src, meta, slots, lr_list):
        B = meta.shape[0]
        starts = meta[:, 0:2]
        idxs = meta[:, 2]
        kinds = meta[:, 3:6]
        coarse = meta[:, 6:12].reshape(B, 3, 2)
        out = {}
        if need_cond:
            if mode == "canvas":

                def crop1(st):
                    return jax.lax.dynamic_slice(
                        src, (st[0], st[1], jnp.int32(0)), (ps, ps, 3)
                    )

                conds = jax.vmap(crop1)(starts)
                if center_cond:
                    y0 = (ps - pw) // 2
                    centers = conds[:, y0 : y0 + pw, y0 : y0 + pw, :]
                    yi = _nearest_idx(ps, pw)
                    centers = centers[:, yi][:, :, yi]
                    # center channels are slices of the ROUND-quantized
                    # canvas — identical to the host serving path, which
                    # round-quantizes its center channels too
                    # (get_cond_images; ADVICE r3 round-vs-trunc fix)
                    conds = jnp.concatenate([conds, centers], axis=-1)
            else:
                # the stack was materialized with the center channels
                # already appended when center_cond is on
                conds = src[idxs]
            out["cond"] = conds
        if has_lr:
            out["lowres"] = jnp.stack(lr_list)
        if any_strip:
            stacked = [jnp.stack(s) for s in slots]  # 3 x (B, hs, hs, 3)
            hs = stacked[0].shape[1]
            ov = int(overlap * hs)

            def resolve(s):
                arr = stacked[s]
                kind = kinds[:, s]
                if mode is None or not need_cond:
                    coarse_img = arr
                else:

                    def cc(stv, idx):
                        plane = src if mode == "canvas" else src[idx]
                        c = jax.lax.dynamic_slice(
                            plane[..., :3],
                            (stv[0], stv[1], jnp.int32(0)),
                            (pw, pw, 3),
                        )
                        c = jax.image.resize(
                            c.astype(jnp.float32), (hs, hs, 3), method="linear"
                        )
                        return jnp.round(jnp.clip(c, 0.0, 255.0)).astype(jnp.uint8)

                    coarse_img = jax.vmap(cc)(coarse[:, s], idxs)
                k4 = kind[:, None, None, None]
                return (
                    jnp.where(k4 == 1, arr, jnp.where(k4 == 2, coarse_img, 0)),
                    kind,
                )

            above, ka = resolve(0)
            nxt, kn = resolve(1)
            dia, kd = resolve(2)
            imgs = jnp.zeros((B, hs, hs, 3), jnp.uint8)
            masks = jnp.zeros((B, hs, hs), jnp.uint8)
            pa4 = (ka > 0)[:, None, None, None]
            pa3 = (ka > 0)[:, None, None]
            imgs = imgs.at[:, :ov].set(jnp.where(pa4, above[:, -ov:], imgs[:, :ov]))
            masks = masks.at[:, :ov].set(jnp.where(pa3, jnp.uint8(1), masks[:, :ov]))
            pn4 = (kn > 0)[:, None, None, None]
            pn3 = (kn > 0)[:, None, None]
            pd4 = (kd > 0)[:, None, None, None]
            if ori == -1:
                imgs = imgs.at[:, :, :ov].set(
                    jnp.where(pn4, nxt[:, :, -ov:], imgs[:, :, :ov])
                )
                masks = masks.at[:, :, :ov].set(
                    jnp.where(pn3, jnp.uint8(1), masks[:, :, :ov])
                )
                # diag corner last (it wins), mask untouched — the
                # reference's quirk, sample_ultra_res.py:166-172
                imgs = imgs.at[:, :ov, :ov].set(
                    jnp.where(pd4, dia[:, -ov:, -ov:], imgs[:, :ov, :ov])
                )
            else:
                imgs = imgs.at[:, :, -ov:].set(
                    jnp.where(pn4, nxt[:, :, :ov], imgs[:, :, -ov:])
                )
                masks = masks.at[:, :, -ov:].set(
                    jnp.where(pn3, jnp.uint8(1), masks[:, :, -ov:])
                )
                imgs = imgs.at[:, :ov, -ov:].set(
                    jnp.where(pd4, dia[:, -ov:, :ov], imgs[:, :ov, -ov:])
                )
            out["inpaint"] = imgs
            out["masks"] = masks
        return out

    return fn


@functools.lru_cache(maxsize=None)
def _prep_program(*statics):
    return jax.jit(_make_prep_fn(*statics))
