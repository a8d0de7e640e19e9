"""Checkpoint IO (Orbax) with shape-tolerant partial restore.

Covers the reference's checkpoint semantics:
  * trainer save/load of params + EMA + optimizer state + step counter
    (/root/reference/train.py:188,245 — `trainer.save`/`trainer.load`)
  * `noop_if_not_exist` cold-start (/root/reference/train.py:188)
  * `restore_parts` shape-tolerant partial restore
    (/root/reference/sample_ultra_res.py:59-63): leaves whose shapes
    match are restored, everything else keeps its current value
  * a `version` string stored alongside, checked on load
    (/root/reference/sample_ultra_res.py:56-57)
  * remote paths (gs://, s3://, ...) — the fsspec-checkpoint-IO
    capability (/root/reference/sample_ultra_res.py:51-53) — via
    etils.epath, which Orbax uses natively
"""

from __future__ import annotations

import json
from typing import Any, Optional

import jax
import numpy as np
from etils import epath

from .. import __version__

_META_NAME = "kdt_meta.json"

# URI-prefix -> replacement rewrites applied before epath resolution.
# Lets a bucket URI be mounted onto a local directory (air-gapped runs,
# tests exercising the remote-URI code path without network).
_SCHEME_MOUNTS: dict = {}


def mount_uri_prefix(prefix: str, target: str) -> None:
    """Route every path under `prefix` (e.g. 'gs://my-bucket') to
    `target` (a local directory or another URI)."""
    _SCHEME_MOUNTS[prefix.rstrip("/")] = target.rstrip("/")


def unmount_uri_prefix(prefix: str) -> None:
    _SCHEME_MOUNTS.pop(prefix.rstrip("/"), None)


def _path(path: str) -> epath.Path:
    """Local paths are absolutized (tensorstore requires it); remote URIs
    (gs://, s3://, ...) pass through epath, after any registered mount
    rewrites."""
    s = str(path)
    for prefix, target in _SCHEME_MOUNTS.items():
        if s == prefix or s.startswith(prefix + "/"):
            s = target + s[len(prefix):]
            break
    if "://" not in s:
        import os

        s = os.path.abspath(os.path.expanduser(s))
    return epath.Path(s)


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, tree: Any, *, metadata: Optional[dict] = None) -> None:
    """Save a pytree to `path` (a local directory or remote URI).

    For LOCAL paths the overwrite is crash-safe: the new checkpoint is
    fully written to a `<name>.tmp_save` sibling first, then swapped in
    (delete old + rename). A kill during the save — which for the 631M
    flagship stage lasts ~11 min, far longer than the training between
    saves — leaves the previous checkpoint intact instead of a deleted
    `ckpt_latest` and an unfinalized new one; the unprotected window
    shrinks to the delete+rename (~seconds). Remote URIs keep the
    simple delete-then-save sequence (directory rename is not atomic or
    even supported on object stores; Orbax's own commit markers handle
    partial writes there).

    Multi-host safe: every process must call this (Orbax's array save is
    collective for sharded arrays); deletes, metadata writes, and the
    final swap happen on process 0 only, with barriers so no process
    races them."""
    p = _path(path)
    ckptr = _checkpointer()

    def barrier(name):
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(name)

    local = "://" not in str(p)
    dest = p.parent / (p.name + ".tmp_save") if local else p

    if jax.process_index() == 0 and dest.exists():
        dest.rmtree()
    if not local and jax.process_index() == 0 and p.exists():
        p.rmtree()
    barrier("kdt_ckpt_pre_save")
    ckptr.save(dest, tree)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        meta = {"version": __version__, **(metadata or {})}
        (dest / _META_NAME).write_text(json.dumps(meta))
        if local:
            if p.exists():
                p.rmtree()
            dest.rename(p)
    barrier("kdt_ckpt_post_save")


def checkpoint_exists(path: str) -> bool:
    return _path(path).is_dir()


def load_metadata(path: str) -> dict:
    meta_path = _path(path) / _META_NAME
    if meta_path.exists():
        return json.loads(meta_path.read_text())
    return {}


def load_checkpoint(path: str, target: Any, *, partial: bool = False) -> Any:
    """Restore a pytree shaped like `target`.

    partial=True is the `restore_parts` equivalent: restore whatever
    leaves exist with matching shapes/dtypes; keep `target`'s values
    elsewhere (and report what was skipped).
    """
    p = _path(path)
    ckptr = _checkpointer()
    meta = load_metadata(path)
    if meta.get("version") and meta["version"] != __version__:
        print(
            f"[checkpoint] saved at version {meta['version']}, current {__version__}"
        )
    if not partial:
        try:
            return ckptr.restore(p, target)
        except Exception as e:
            # Layout drift (old checkpoints with migrated leaf shapes) is
            # retried via _restore_with_migrations. No message sniffing:
            # the retry runs for ANY failure, but if it fails too we
            # surface the ORIGINAL error — for a corrupt checkpoint or an
            # IO fault that is the informative one, and the migration
            # attempt's own error stays attached as __context__.
            try:
                return _restore_with_migrations(ckptr, p, target, path)
            except Exception:
                raise e

    # shape-tolerant: restore with raw structure, then merge
    try:
        raw = ckptr.restore(p)
    except Exception:
        return ckptr.restore(p, target)

    flat_target = _flatten_with_paths(target)
    flat_raw = _flatten_with_paths(raw)
    merged = dict(flat_target)
    skipped = []
    for k, v in flat_target.items():
        if k in flat_raw:
            r = _adapt_leaf(k, flat_raw[k], np.shape(v))
            if np.shape(r) == np.shape(v):
                merged[k] = jax.numpy.asarray(r, dtype=getattr(v, "dtype", None))
                continue
        skipped.append(k)
    if skipped:
        print(f"[checkpoint] partial restore skipped {len(skipped)} leaves: "
              f"{skipped[:5]}{'...' if len(skipped) > 5 else ''}")
    return _unflatten_like(target, merged)


def _restore_with_migrations(ckptr, p, target, path: str):
    """Non-partial restore of a checkpoint whose leaf SHAPES changed in a
    known layout migration: restore each mismatched leaf at its saved
    shape, then `_adapt_leaf` it into the target layout. Leaf ORDER must
    match (same tree structure — metadata flattens NamedTuples and
    target trees in parallel order)."""
    saved_shapes = [
        getattr(m, "shape", None)
        for m in jax.tree_util.tree_leaves(ckptr.metadata(p).item_metadata.tree)
    ]
    flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    if len(saved_shapes) != len(flat):
        raise ValueError(
            f"checkpoint at {path} has {len(saved_shapes)} leaves but the "
            f"target expects {len(flat)}; not restorable non-partially "
            f"(use partial=True)"
        )
    restore_leaves = []
    for (keypath, leaf), saved in zip(flat, saved_shapes):
        if saved is not None and tuple(saved) != tuple(np.shape(leaf)):
            leaf = jax.ShapeDtypeStruct(tuple(saved), getattr(leaf, "dtype", np.float32))
        restore_leaves.append(leaf)
    restored = ckptr.restore(
        p, jax.tree_util.tree_unflatten(treedef, restore_leaves)
    )
    out = []
    bad = []
    for (keypath, tgt), r in zip(flat, jax.tree_util.tree_leaves(restored)):
        key = jax.tree_util.keystr(keypath)
        r = _adapt_leaf(key, r, np.shape(tgt))
        if np.shape(r) != np.shape(tgt):
            bad.append(key)
        out.append(r)
    if bad:
        raise ValueError(
            f"checkpoint at {path} is shape-mismatched on {len(bad)} leaves "
            f"with no known migration (e.g. {bad[:3]}); use partial=True"
        )
    return jax.tree_util.tree_unflatten(treedef, out)


def _adapt_leaf(key: str, raw, target_shape):
    """Layout migrations for leaves whose VALUES are unchanged.

    Downsample `proj` kernels moved from space-to-depth form (1,1,4C,D)
    to strided-conv form (2,2,C,D) — the identical weights indexed
    (dy,dx,c) instead of (1,1,4c) (models/blocks.py:Downsample), so old
    checkpoints restore exactly via reshape."""
    rs = tuple(np.shape(raw))
    ts = tuple(target_shape)
    if (
        "proj" in key
        and len(rs) == 4
        and len(ts) == 4
        and rs != ts
        and int(np.prod(rs)) == int(np.prod(ts))
        and {rs[:2], ts[:2]} == {(1, 1), (2, 2)}
    ):
        return np.asarray(raw).reshape(ts)
    return raw


def _flatten_with_paths(tree: Any) -> dict:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(path): leaf for path, leaf in flat}


def _unflatten_like(target: Any, flat: dict) -> Any:
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(target)
    leaves = [flat[jax.tree_util.keystr(p)] for p, _ in paths_leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)
