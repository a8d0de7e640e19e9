"""Gigapixel whole-slide generation — the batched-wavefront orchestrator.

Re-designs /root/reference/sample_ultra_res.py (the reference's
centerpiece) TPU-first. The reference runs ONE patch per GPU worker
process per denoise pass, moving every patch host<->device and pickling
tensors through mp.Queues. Here:

  * the dependency schedule is computed up front (sample/wavefront.py)
  * each wave of ready patches is ONE batched, jit-cached,
    device-resident denoise scan (sample_stage) — patches/sec scales
    with the batch dim instead of process count
  * cond-image recentering is a direct crop-with-fill (mathematically
    identical to the reference's roll + fill + CenterCrop,
    sample_ultra_res.py:358-391, but O(patch) instead of O(image))
  * overlap strips for RePaint seam blending are assembled on host in
    numpy between waves (tiny vs the denoise compute) exactly as
    sample_ultra_res.py:149-174 does
  * the final stitch pastes generated patches onto a bilinearly
    upscaled coarse canvas (sample_ultra_res.py:430-448), built in
    uint8 and chunked so a 40k² canvas needs ~5 GB instead of ~20 GB
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..cascade import Cascade, stage_sampler_steps
from ..data.wsi import MAG_LEVEL_SIZES, PATCH_SIZE, inner_patch_width, resize_nearest
from ..ops.image import foreground_mask_for_patches
from .wavefront import Pos, bucket_size, choose_orientation, full_grid, plan_waves


# ---------------------------------------------------------------------------
# host-side resize helpers
# ---------------------------------------------------------------------------


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize (HWC float) — half-pixel-centered like
    F.interpolate(align_corners=False)."""
    h, w = img.shape[:2]
    if h == out_h and w == out_w:
        return img
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0).astype(np.float32)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0).astype(np.float32)[None, :, None]
    img = img.astype(np.float32)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def resize_nearest_batch(batch: np.ndarray, size: int) -> np.ndarray:
    """Nearest resize of (N, H, W, C) with jax.image.resize semantics
    (output pixel i reads input floor((i + 0.5) * in / out)) — host-side
    pre-resize of conditioning images before upload must be bit-identical
    to the in-model resize it replaces (models/unet.py cond_images)."""
    h, w = batch.shape[1:3]
    if h == size and w == size:
        return batch
    ys = np.clip(((np.arange(size) + 0.5) * h / size).astype(np.int64), 0, h - 1)
    xs = np.clip(((np.arange(size) + 0.5) * w / size).astype(np.int64), 0, w - 1)
    return batch[:, ys][:, :, xs]


def to_wire_uint8(img: np.ndarray) -> np.ndarray:
    """[0,1] float -> uint8 [0,255] for host->device transport (decoded
    on device by Cascade.sample_stage). Conditioning images come from
    uint8 canvases, so this round-trip is exact for them."""
    return np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)


def crop_with_fill(
    img: np.ndarray, y0: int, x0: int, size: int, fill: float
) -> np.ndarray:
    """size² crop at (y0, x0) with out-of-bounds regions set to `fill`.

    Equivalent to the reference's torch.roll + edge fill + CenterCrop
    (sample_ultra_res.py:358-391): shifting the image so a point is at
    the center and center-cropping IS a crop centered on that point.
    """
    h, w, c = img.shape
    out = np.full((size, size, c), fill, np.float32)
    ys, ye = max(y0, 0), min(y0 + size, h)
    xs, xe = max(x0, 0), min(x0 + size, w)
    if ys < ye and xs < xe:
        out[ys - y0 : ye - y0, xs - x0 : xe - x0] = img[ys:ye, xs:xe]
    return out


# ---------------------------------------------------------------------------
# conditioning-image construction
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Patch-grid geometry for one magnification level."""

    patch_width: int  # width of a mag-k patch inside the mag-(k-1) image
    patch_dist: int  # stride between patch origins in that image
    num_patches_width: int
    overlap: float

    @classmethod
    def build(
        cls,
        zoomed_width: int,
        mag_level: int,
        overlap: float,
        *,
        mag_sizes: Sequence[int] = MAG_LEVEL_SIZES,
        patch_size: int = PATCH_SIZE,
        airs: bool = False,
    ) -> "GridSpec":
        pw = inner_patch_width(mag_level, patch_size=patch_size, mag_sizes=tuple(mag_sizes))
        pd = int(pw * (1 - overlap))
        n = 1 + math.ceil((zoomed_width - pw) / pd)
        if airs:  # prefer staying in bounds (sample_ultra_res.py:312-314)
            n = max(1, n - 1)
        return cls(pw, pd, n, overlap)


def tissue_patch_filter(
    zoomed_image: np.ndarray, grid: GridSpec, *, airs: bool = False
) -> List[Pos]:
    """mag-2 foreground filtering: only generate patches overlapping
    tissue (sample_ultra_res.py:317-352). Mask math runs on device."""
    mask = np.asarray(foreground_mask_for_patches(zoomed_image, airs=airs))
    keep = []
    for i in range(grid.num_patches_width):
        for j in range(grid.num_patches_width):
            y, x = i * grid.patch_dist, j * grid.patch_dist
            window = mask[y : y + grid.patch_width, x : x + grid.patch_width]
            if window.size and window.any():
                keep.append((i, j))
    return keep


def get_cond_images(
    zoomed_image: np.ndarray,
    mag_level: int,
    *,
    overlap: float,
    mag_sizes: Sequence[int] = MAG_LEVEL_SIZES,
    patch_size: int = PATCH_SIZE,
    center_cond: bool = False,  # the "v2" 6-channel variant
    airs: bool = False,
    fill: float = 0.95,
    all_patches: bool = False,
    materialize: bool = True,
) -> Tuple[Optional[np.ndarray], List[Pos], GridSpec]:
    """Per-patch recentered conditioning images.

    zoomed_image: (H, W, 3) float [0,1] — the stitched mag-(k-1) output.
    Returns (cond_images (N, patch_size, patch_size, C), patch_pos, grid).

    `all_patches` skips the mag-2 tissue filter and generates the full
    grid — needed when the coarse image carries no real tissue signal
    (fresh-params demos, wall-clock benchmarks, non-histology content).
    `materialize=False` computes only (patch_pos, grid) and returns None
    cond images — the device-resident transport slices crops from the
    uploaded canvas instead of staging N patch-size copies on host.
    """
    if airs:
        fill = 0.0
    h, w = zoomed_image.shape[:2]
    grid = GridSpec.build(
        w, mag_level, overlap, mag_sizes=mag_sizes, patch_size=patch_size, airs=airs
    )

    if mag_level == 2 and not all_patches:
        patch_pos = tissue_patch_filter(zoomed_image, grid, airs=airs)
    else:
        patch_pos = full_grid(grid.num_patches_width)

    if not materialize:
        return None, patch_pos, grid

    conds = []
    for i, j in patch_pos:
        cy = i * grid.patch_dist + grid.patch_width // 2
        cx = j * grid.patch_dist + grid.patch_width // 2
        cond = crop_with_fill(
            zoomed_image, cy - patch_size // 2, cx - patch_size // 2, patch_size, fill
        )
        if center_cond:
            pw = grid.patch_width
            y0 = (patch_size - pw) // 2
            center = cond[y0 : y0 + pw, y0 : y0 + pw]
            # ROUND-quantize the center channels (not the training
            # dataset's truncating uint8 cast, data/ultra_res.py): the
            # wire transport rounds anyway, and rounding here makes the
            # host path bit-identical to the resident canvas slicing for
            # ANY float canvas (ADVICE r3 — trunc deviated up to 1/255).
            # The reference's serving path applies no quantization at all
            # here (sample_ultra_res.py:393-400 keeps float tensors), so
            # a <=1/255 departure from the dataset construction is well
            # inside the lowres-aug noise the models train against.
            center_up = resize_nearest(
                to_wire_uint8(center), patch_size, patch_size
            ).astype(np.float32) / 255.0
            cond = np.concatenate([cond, center_up], axis=-1)
        conds.append(cond)
    return np.stack(conds) if conds else np.zeros((0, patch_size, patch_size, 3)), patch_pos, grid


# ---------------------------------------------------------------------------
# overlap-strip assembly (RePaint seam blending)
# ---------------------------------------------------------------------------


def assemble_inpaint_strips(
    wave: Sequence[Pos],
    generated: Dict[Pos, np.ndarray],
    cond_images_by_pos: Optional[Dict[Pos, np.ndarray]],
    grid: GridSpec,
    stage_size: int,
    orientation: int,
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """Build (inpaint_images, inpaint_masks) for a wave at one stage size.

    For each patch: if the above / next-to / diagonal neighbour was
    generated, its overlap strip is copied in; otherwise, if the coarse
    cond image covers that area, a bilinear-upscaled crop of it is used
    (sample_ultra_res.py:125-174). mask=1 marks known pixels.
    """
    overlap_px = int(grid.overlap * stage_size)
    if overlap_px == 0:
        return None, None

    n = grid.num_patches_width
    imgs = np.zeros((len(wave), stage_size, stage_size, 3), np.float32)
    masks = np.zeros((len(wave), stage_size, stage_size), np.float32)
    any_strip = False

    def neighbor_patch(pos: Pos, base: Pos) -> Optional[np.ndarray]:
        """Neighbour pixels at stage_size² or None.

        Priority mirrors sample_ultra_res.py:125-140: a generated patch
        wins; otherwise (e.g. the neighbour was tissue-filtered out of
        the patch set) fall back to the coarse cond image when there is
        image space in that direction."""
        if pos in generated:
            p = generated[pos]
            scale = 255.0 if p.dtype == np.uint8 else 1.0  # uint8-wire stores
            p = p.astype(np.float32) / scale
            if p.shape[0] != stage_size:
                p = resize_bilinear(p, stage_size, stage_size)
            return p
        if cond_images_by_pos is None:
            return None
        i, j = pos
        cond = cond_images_by_pos.get(base)
        if cond is None:
            return None
        ps = cond.shape[0]
        top_y = ps // 2 - grid.patch_width // 2 + (i - base[0]) * grid.patch_dist
        top_x = ps // 2 - grid.patch_width // 2 + (j - base[1]) * grid.patch_dist
        if top_y < 0 or top_x < 0 or top_y + grid.patch_width > ps or top_x + grid.patch_width > ps:
            return None
        crop = cond[top_y : top_y + grid.patch_width, top_x : top_x + grid.patch_width, :3]
        return resize_bilinear(crop, stage_size, stage_size)

    for b, (i, j) in enumerate(wave):
        above = neighbor_patch((i - 1, j), (i, j)) if i > 0 else None
        nj = j + orientation
        next_to = neighbor_patch((i, nj), (i, j)) if 0 <= nj < n else None
        diag = (
            neighbor_patch((i - 1, nj), (i, j)) if (i > 0 and 0 <= nj < n) else None
        )

        if above is not None:
            imgs[b, :overlap_px, :] = above[-overlap_px:, :]
            masks[b, :overlap_px, :] = 1.0
            any_strip = True
        if next_to is not None:
            if orientation == -1:
                imgs[b, :, :overlap_px] = next_to[:, -overlap_px:]
                masks[b, :, :overlap_px] = 1.0
            else:
                imgs[b, :, -overlap_px:] = next_to[:, :overlap_px]
                masks[b, :, -overlap_px:] = 1.0
            any_strip = True
        if diag is not None:
            if orientation == -1:
                imgs[b, :overlap_px, :overlap_px] = diag[-overlap_px:, -overlap_px:]
            else:
                imgs[b, :overlap_px, -overlap_px:] = diag[-overlap_px:, :overlap_px]
            any_strip = True

    if not any_strip:
        return None, None
    return imgs, masks


# ---------------------------------------------------------------------------
# the orchestrator
# ---------------------------------------------------------------------------


def _stage_batch(
    stage_size: int,
    max_wave_batch: int,
    final_stage_batch: Optional[int],
    data_size: int,
    is_final: bool = True,
) -> int:
    """Wave-chunk batch cap for one stage. <=256² stages amortize weight
    streaming across the wave (max_wave_batch, round-3 sweep: saturated
    by 16, default 32). Larger stages default to 1 per device — the pure
    chip-throughput optimum (batch 2 measured 1.37x slower per patch) —
    unless `final_stage_batch` raises it on the FINAL stage only (its
    name is its contract — ADVICE r4) to trade compute for DISPATCH
    COUNT over a high-latency host link (artifacts/r4_gigapixel_wall)."""
    if stage_size <= 256:
        return max_wave_batch
    return max((final_stage_batch if is_final else None) or 1, data_size, 1)


def _pad_to(arr: np.ndarray, b: int) -> np.ndarray:
    if arr.shape[0] == b:
        return arr
    reps = np.repeat(arr[-1:], b - arr.shape[0], axis=0)
    return np.concatenate([arr, reps], axis=0)


def generate_patch_set(
    cascade: Cascade,
    params_per_stage: Sequence,
    key,
    *,
    patch_pos: List[Pos],
    grid: GridSpec,
    cond_images: Optional[np.ndarray],
    inpaint_resample_times: int = 1,
    ignore_stage_1: bool = False,
    max_wave_batch: int = 32,
    store_dtype=np.float16,
    progress: bool = True,
    mesh=None,
    debug_dir: Optional[str] = None,
    ddim_steps: int = 0,
    dpmpp_steps: int = 0,
    wire: Optional[str] = "uint8",
    zoomed_image: Optional[np.ndarray] = None,
    fill: float = 0.95,
    center_cond: bool = False,
    final_stage_batch: Optional[int] = None,
    metrics_hook=None,
) -> Dict[Pos, np.ndarray]:
    """Generate all patches of one magnification level through the full
    cascade, wave by wave, batched.

    `final_stage_batch`: wave-batch cap for the >256² final stage
    (default 1 per device — the chip-throughput optimum; batch 2 is
    1.37x slower per patch in pure compute). Raising it trades compute
    for DISPATCHES: over a high-latency host link (the axon tunnel,
    ~0.2 s per call) the end-to-end wall-clock optimum is larger —
    measured in artifacts/r4_gigapixel_wall.

    `mesh`: shard each wave batch over the mesh "data" axis (SPMD
    multi-chip inference — the TPU replacement for the reference's
    one-process-per-GPU pool, sample_ultra_res.py:213-249).
    `debug_dir`: dump every intermediate artifact (cond image, inpaint
    strip/mask, per-stage patches) as PNGs — the reference's demo mode
    (sample_ultra_res_demo.py:169-198).

    `wire="uint8"` (default) moves images over the host<->device link as
    uint8: cond images are pre-resized to the stage input size (bit-equal
    to the in-model nearest resize) and encoded [0,255]; inpaint strips
    and masks likewise; stage outputs come back uint8 and are STORED
    uint8 between stages (so inter-stage lowres is genuinely identical
    to the resident path's device store, not an f16 rounding of it).
    This is exact for cond images (they come from uint8 canvases) and
    quantizes strips / inter-stage lowres to 1/255 — far below the
    lowres aug-noise the models are conditioned with — while cutting
    per-patch transfer bytes ~5x (the final canvas is uint8 anyway).
    `wire=None` restores fp32 transport.

    `wire="resident"` keeps the level device-resident (sample/resident.py):
    the coarse canvas (`zoomed_image`, with `fill`/`center_cond` from the
    level geometry) is uploaded once and all conditioning is assembled
    on-device; only finished final-stage patches return to host, via a
    background fetcher that overlaps the download with compute. When no
    canvas is passed, the materialized `cond_images` stack is uploaded
    once instead; outpainting (no conditioning) needs neither.

    resident composes with `mesh`: conditioning is assembled on-device,
    resharded onto the wave batch sharding (an XLA device-to-device
    scatter — on real multi-chip hardware this traffic rides ICI, never
    the host link), and finished pixels stay on the mesh's devices until
    the fetcher pulls the final stage. The TPU answer to the reference's
    one-process-per-GPU pool (/root/reference/sample_ultra_res.py:213-249)
    with no per-patch host staging (:202).

    Returns pos -> final-stage patch (stage_size², float16 [0,1]).
    """
    import os as _os

    resident = wire == "resident"
    # fused prep+sampling (one dispatch per chunk): single-device
    # resident serving only — the mesh path keeps the explicit prep ->
    # reshard -> sample pipeline, and debug mode wants the prep
    # intermediates materialized for dumping
    fused = (
        resident
        and mesh is None
        and debug_dir is None
        and _os.environ.get("KDT_RESIDENT_FUSED", "1") != "0"
    )
    num_stages = cascade.config.num_stages
    orientation = choose_orientation(patch_pos)
    waves = plan_waves(patch_pos, orientation)
    cond_by_pos = (
        {pos: cond_images[k] for k, pos in enumerate(patch_pos)}
        if cond_images is not None and not resident
        else None
    )

    engine = None
    if resident:
        from .resident import ResidentEngine, last_use_waves

        patch_size = cascade.config.stages[-1].image_size
        engine = ResidentEngine(
            patch_size=patch_size,
            grid=grid,
            orientation=orientation,
            canvas=zoomed_image,
            cond_stack=cond_images if zoomed_image is None else None,
            patch_pos=patch_pos,
            fill=fill,
            center_cond=center_cond,
            store_dtype=store_dtype,
        )
        last_use = last_use_waves(waves, orientation)

    # per-stage generated patches (host, compact dtype)
    stores: List[Dict[Pos, np.ndarray]] = [dict() for _ in range(num_stages + 1)]

    start_stage = 1
    if ignore_stage_1:
        # seed stage 2 from the center crop of the cond image
        # (sample_ultra_res.py:418-421)
        if resident:
            assert engine.mode is not None, "ignore_stage_1 needs conditioning"
            stores[1] = engine.seed_center_crops(patch_pos)
        else:
            assert cond_by_pos is not None
            ps = next(iter(cond_by_pos.values())).shape[0]
            y0 = ps // 2 - grid.patch_width // 2
            for pos, cond in cond_by_pos.items():
                crop = cond[
                    y0 : y0 + grid.patch_width, y0 : y0 + grid.patch_width, :3
                ]
                stores[1][pos] = (
                    to_wire_uint8(crop) if wire == "uint8" else crop.astype(store_dtype)
                )
        start_stage = 2

    if debug_dir is not None:
        import os

        from ..utils.logging import save_image

        os.makedirs(debug_dir, exist_ok=True)

    if mesh is not None:
        from ..parallel.mesh import batch_sharding

        data_size = mesh.shape.get("data", 1)
        wave_sharding = batch_sharding(mesh)
    else:
        data_size = 1
        wave_sharding = None

    try:
        for stage in range(start_stage, num_stages + 1):
            stage_size = cascade.config.stage(stage).image_size
            lowres_needed = cascade.config.stage(stage).lowres_cond
            # per-stage batch cap: measured on v5e, the 1024² stage saturates
            # the chip at batch 1 (batch 2 is 1.37x SLOWER per patch and
            # batch 4 fails to compile); batching only pays at <= 256²
            stage_batch = _stage_batch(
                stage_size, max_wave_batch, final_stage_batch, data_size,
                is_final=stage == num_stages,
            )
            # wave-scan (round 5): on the fused resident path, >256²
            # stages take whole wave chunks and run them SEQUENTIALLY at
            # batch 1 inside one lax.scan program — batch-1 per-patch
            # compute (the measured optimum) at one dispatch per chunk
            # instead of one per patch. KDT_RESIDENT_SCAN caps the chunk
            # (0 disables; default 16).
            scan_cap = int(_os.environ.get("KDT_RESIDENT_SCAN", "16"))
            scan_min = int(_os.environ.get("KDT_RESIDENT_SCAN_MIN_PIX", "512"))
            use_scan = fused and stage_size >= scan_min and scan_cap > 1
            if use_scan:
                stage_batch = scan_cap
            for wi, wave in enumerate(waves):
                for chunk_start in range(0, len(wave), stage_batch):
                    chunk = wave[chunk_start : chunk_start + stage_batch]
                    bsz = bucket_size(len(chunk))
                    if bsz % data_size:
                        bsz = ((bsz + data_size - 1) // data_size) * data_size

                    wire_u8 = wire == "uint8"
                    inp = msk = None
                    # per-stage step counts (int or sequence — expresses
                    # mixed serving points like dpmpp-25/25 + distilled
                    # ddim-4 on the 1024² stage); dpmpp wins per stage
                    pstep = stage_sampler_steps(dpmpp_steps, stage, num_stages)
                    dstep = stage_sampler_steps(ddim_steps, stage, num_stages)
                    if fused and resident:
                        # ONE dispatch per chunk: prep + sampling fused
                        # into a single program (PERF.md round 4 — per-
                        # dispatch tunnel cost dominated the e2e wall)
                        key, sk = jax.random.split(key)
                        outs = engine.sample_chunk(
                            cascade,
                            params_per_stage[stage - 1],
                            stage,
                            sk,
                            chunk,
                            stage_size,
                            stores[stage],
                            stores[stage - 1] if lowres_needed else None,
                            bsz,
                            need_cond=engine.mode is not None,
                            inpaint_resample_times=inpaint_resample_times,
                            use_ddim=pstep == 0 and dstep > 0,
                            ddim_steps=dstep,
                            dpmpp_steps=pstep,
                            scan=use_scan,
                        )
                        for k, pos in enumerate(chunk):
                            stores[stage][pos] = outs[k]
                            if stage == num_stages:
                                engine.enqueue_final(pos, outs[k])
                        continue
                    if resident:
                        kwargs = engine.prep_chunk(
                            chunk,
                            stage_size,
                            stores[stage],
                            stores[stage - 1] if lowres_needed else None,
                            bsz,
                            need_cond=engine.mode is not None,
                        )
                        if "inpaint_images" in kwargs:
                            kwargs["inpaint_resample_times"] = inpaint_resample_times
                    else:
                        kwargs = {}
                        if cond_by_pos is not None:
                            conds = np.stack([cond_by_pos[p] for p in chunk]).astype(
                                np.float32
                            )
                            if wire_u8:
                                if conds.shape[1] > stage_size:
                                    conds = resize_nearest_batch(conds, stage_size)
                                conds = to_wire_uint8(conds)
                            kwargs["cond_images"] = _pad_to(conds, bsz)
                        if lowres_needed:
                            lr = np.stack([stores[stage - 1][p] for p in chunk])
                            kwargs["lowres_image"] = _pad_to(
                                lr if wire_u8 else lr.astype(np.float32), bsz
                            )
                        inp, msk = assemble_inpaint_strips(
                            chunk, stores[stage], cond_by_pos, grid, stage_size, orientation
                        )
                        if inp is not None:
                            kwargs["inpaint_images"] = _pad_to(
                                to_wire_uint8(inp) if wire_u8 else inp, bsz
                            )
                            kwargs["inpaint_masks"] = _pad_to(
                                msk.astype(np.uint8) if wire_u8 else msk, bsz
                            )
                            kwargs["inpaint_resample_times"] = inpaint_resample_times

                    if wave_sharding is not None:
                        # host arrays (uint8/fp32 wire) upload sharded; the
                        # resident prep outputs reshard device-to-device
                        # (ICI on real multi-chip hardware, never the host)
                        kwargs = {
                            k: jax.device_put(jax.numpy.asarray(v), wave_sharding)
                            if isinstance(v, (np.ndarray, jax.Array))
                            else v
                            for k, v in kwargs.items()
                        }

                    if pstep > 0:
                        kwargs["dpmpp_steps"] = pstep
                    elif dstep > 0:
                        kwargs["use_ddim"] = True
                        kwargs["ddim_steps"] = dstep
                    key, sk = jax.random.split(key)
                    if resident:
                        outs = cascade.sample_stage(
                            params_per_stage[stage - 1], stage, sk, batch_size=bsz,
                            output_dtype="uint8", output_split=True, **kwargs
                        )
                        for k, pos in enumerate(chunk):
                            stores[stage][pos] = outs[k]
                            if stage == num_stages:
                                engine.enqueue_final(pos, outs[k])
                    else:
                        out = cascade.sample_stage(
                            params_per_stage[stage - 1], stage, sk, batch_size=bsz,
                            output_dtype="uint8" if wire_u8 else None, **kwargs
                        )
                        out = np.asarray(out)[: len(chunk)]
                        # uint8-wire stores stay uint8 between stages (exactly
                        # the resident device store's values); fp32 wire keeps
                        # the compact-float store
                        if not wire_u8:
                            out = out.astype(store_dtype)
                        for k, pos in enumerate(chunk):
                            stores[stage][pos] = out[k]

                    if debug_dir is not None:
                        if resident:
                            out = np.stack(
                                [np.asarray(stores[stage][p]) for p in chunk]
                            ).astype(np.float32) / 255.0
                            ri = kwargs.get("inpaint_images")
                            inp = (
                                np.asarray(ri).astype(np.float32)[: len(chunk)] / 255.0
                                if ri is not None
                                else None
                            )
                            rm = kwargs.get("inpaint_masks")
                            msk = (
                                np.asarray(rm).astype(np.float32)[: len(chunk)]
                                if rm is not None
                                else None
                            )
                            rc = kwargs.get("cond_images")
                            cond_dump = (
                                np.asarray(rc).astype(np.float32)[: len(chunk)] / 255.0
                                if rc is not None
                                else None
                            )
                        else:
                            cond_dump = (
                                np.stack([cond_by_pos[p] for p in chunk])
                                if cond_by_pos is not None
                                else None
                            )
                        for k, pos in enumerate(chunk):
                            tag = f"s{stage}_w{wi}_{pos[0]}_{pos[1]}"
                            patch_f = out[k].astype(np.float32)
                            if out[k].dtype == np.uint8:
                                patch_f /= 255.0
                            save_image(patch_f, f"{debug_dir}/{tag}_patch.png")
                            if cond_dump is not None:
                                save_image(cond_dump[k][..., :3], f"{debug_dir}/{tag}_cond.png")
                            if inp is not None:
                                save_image(inp[k], f"{debug_dir}/{tag}_inpaint.png")
                                save_image(
                                    np.repeat(msk[k][..., None], 3, -1),
                                    f"{debug_dir}/{tag}_inpaint_mask.png",
                                )
                if resident and stage == num_stages:
                    # final-stage device entries are dead once no later wave
                    # reads their strips (the fetcher holds its own handle
                    # until the download lands) — bounds device memory to a
                    # few waves even on full-slide patch sets
                    for pos in [
                        p for p in stores[stage] if last_use.get(p, -1) <= wi
                    ]:
                        del stores[stage][pos]
                if metrics_hook is not None:
                    # per-(stage, wave) observability: the full-slide
                    # artifact's timing + memory trace rides this
                    # (timings are dispatch-side for non-final stages —
                    # only the fetcher/finish() syncs)
                    metrics_hook(
                        stage=stage,
                        wave=wi,
                        patches=len(wave),
                        device_store_entries=sum(len(s) for s in stores),
                    )
                if progress:
                    done = sum(len(w) for w in waves[: wi + 1])
                    print(
                        f"[gigapixel] stage {stage}: wave {wi + 1}/{len(waves)} "
                        f"({done}/{len(patch_pos)} patches)",
                        flush=True,
                    )
            # stage s was the last reader of stores[s-1]: it consumed them
            # as lowres here, and stage s-1's own waves consumed them as
            # strips. Freeing now bounds the intermediate-store footprint
            # (device buffers in resident mode — ~1 GB of 256² patches on
            # a full-slide set — host arrays otherwise) instead of keeping
            # every level alive to the end of the run (ADVICE r3).
            stores[stage - 1].clear()
        if resident:
            return engine.finish()
        if wire == "uint8" and store_dtype != np.uint8:
            # stores held uint8 between stages; public contract is
            # float store_dtype in [0, 1] (store_dtype=np.uint8 opts
            # into raw wire values — the stitch path takes this, saving
            # two full-canvas dtype round-trips)
            return {
                p: (v.astype(np.float32) / 255.0).astype(store_dtype)
                for p, v in stores[num_stages].items()
            }
        return stores[num_stages]
    finally:
        if engine is not None:
            # no-op after a clean finish(); on the error path this stops
            # the background fetcher so a failed level never leaks a
            # daemon thread + queued device buffers (ADVICE r3)
            engine.shutdown()


def stitch_patches(
    zoomed_image: np.ndarray,
    patches: Dict[Pos, np.ndarray],
    *,
    overlap: float,
    num_patches_width: int,
    patch_size: int = PATCH_SIZE,
) -> np.ndarray:
    """Paste generated patches onto the bilinearly upscaled coarse image
    (sample_ultra_res.py:430-448). uint8 canvas, chunked upscale."""
    patch_dist = int(patch_size * (1 - overlap))
    full = patch_size + (num_patches_width - 1) * patch_dist

    canvas = np.empty((full, full, 3), np.uint8)
    # chunked bilinear upscale of the coarse image into the canvas
    chunk_rows = max(1, 4096 * 4096 // max(full, 1))
    h = zoomed_image.shape[0]
    for y0 in range(0, full, chunk_rows):
        y1 = min(y0 + chunk_rows, full)
        ys = (np.arange(y0, y1) + 0.5) * h / full - 0.5
        lo = int(np.clip(np.floor(ys.min()), 0, h - 1))
        hi = int(np.clip(np.ceil(ys.max()) + 1, 1, h))
        # per-strip bilinear: resample source rows [lo, hi) to the output
        # strip using global coordinates
        src = zoomed_image[lo:hi].astype(np.float32)
        yy = ys - lo
        y0i = np.clip(np.floor(yy).astype(np.int64), 0, src.shape[0] - 1)
        y1i = np.minimum(y0i + 1, src.shape[0] - 1)
        wy = np.clip(yy - y0i, 0, 1).astype(np.float32)[:, None, None]
        w = zoomed_image.shape[1]
        xs = (np.arange(full) + 0.5) * w / full - 0.5
        x0i = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
        x1i = np.minimum(x0i + 1, w - 1)
        wx = np.clip(xs - x0i, 0, 1).astype(np.float32)[None, :, None]
        top = src[y0i][:, x0i] * (1 - wx) + src[y0i][:, x1i] * wx
        bot = src[y1i][:, x0i] * (1 - wx) + src[y1i][:, x1i] * wx
        canvas[y0:y1] = np.clip((top * (1 - wy) + bot * wy) * 255.0, 0, 255).astype(
            np.uint8
        )

    for (i, j), patch in patches.items():
        y, x = i * patch_dist, j * patch_dist
        patch = np.asarray(patch)
        if patch.dtype != np.uint8:
            patch = np.clip(patch.astype(np.float32) * 255.0, 0, 255).astype(
                np.uint8
            )
        canvas[y : y + patch_size, x : x + patch_size] = patch
    return canvas


def generate_high_res_image(
    cascade: Cascade,
    params_per_stage: Sequence,
    key,
    zoomed_image: np.ndarray,
    mag_level: int,
    *,
    overlap: float = 0.25,
    mag_sizes: Sequence[int] = MAG_LEVEL_SIZES,
    center_cond: bool = False,
    airs: bool = False,
    inpaint_resample_times: int = 1,
    ignore_stage_1: bool = False,
    max_wave_batch: int = 32,
    progress: bool = True,
    mesh=None,
    debug_dir: Optional[str] = None,
    max_patches: Optional[int] = None,
    ddim_steps: int = 0,
    dpmpp_steps: int = 0,
    all_patches: bool = False,
    wire: Optional[str] = "uint8",
    final_stage_batch: Optional[int] = None,
    metrics_hook=None,
) -> np.ndarray:
    """One magnification refinement: coarse (H, W, 3) [0,1] -> finer
    uint8 canvas (the reference's generate_high_res_image,
    sample_ultra_res.py:415-448). The model patch size is the cascade's
    final stage size (1024 for the reference configs).

    `max_patches` truncates the patch set (the demo sampler's 2x2 limit,
    sample_ultra_res_demo.py:117); `all_patches` disables the mag-2
    tissue filter (see get_cond_images)."""
    patch_size = cascade.config.stages[-1].image_size
    resident = wire == "resident"
    cond_images, patch_pos, grid = get_cond_images(
        zoomed_image,
        mag_level,
        overlap=overlap,
        mag_sizes=mag_sizes,
        patch_size=patch_size,
        center_cond=center_cond,
        airs=airs,
        all_patches=all_patches,
        materialize=not resident,
    )
    if max_patches is not None and len(patch_pos) > max_patches:
        if cond_images is not None:
            cond_images = cond_images[:max_patches]
        patch_pos = patch_pos[:max_patches]
    if progress:
        print(
            f"[gigapixel] mag {mag_level}: {len(patch_pos)} patches, "
            f"grid {grid.num_patches_width}x{grid.num_patches_width}, "
            f"{len(plan_waves(patch_pos, choose_orientation(patch_pos)))} waves",
            flush=True,
        )
    patches = generate_patch_set(
        cascade,
        params_per_stage,
        key,
        patch_pos=patch_pos,
        grid=grid,
        cond_images=cond_images,
        inpaint_resample_times=inpaint_resample_times,
        ignore_stage_1=ignore_stage_1,
        max_wave_batch=max_wave_batch,
        # the stitch re-quantizes to uint8 anyway: keep the wire's uint8
        # values end-to-end instead of uint8->fp16->uint8 round-tripping
        # every 1024² patch on the host (full-slide scale: ~6.5 GB of
        # conversions serialized in the fetcher thread)
        store_dtype=np.uint8 if wire in ("uint8", "resident") else np.float16,
        progress=progress,
        mesh=mesh,
        debug_dir=debug_dir,
        ddim_steps=ddim_steps,
        dpmpp_steps=dpmpp_steps,
        wire=wire,
        zoomed_image=zoomed_image if resident else None,
        fill=0.0 if airs else 0.95,
        center_cond=center_cond,
        final_stage_batch=final_stage_batch,
        metrics_hook=metrics_hook,
    )
    return stitch_patches(
        zoomed_image,
        patches,
        overlap=overlap,
        num_patches_width=grid.num_patches_width,
        patch_size=patch_size,
    )
