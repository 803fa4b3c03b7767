"""Homography-adaptation pseudo-label export — the north-star workload.

Reference pipeline (``export.py:192-352`` + ``datasets/Coco.py:258-291``):
for each image, CPU workers build a 100-warp stack, a DataParallel
forward produces heatmaps, ``combine_heatmap`` (``export.py:49-59``)
masks them, warps them back, and aggregates Σheat/Σmask; NMS + top-k
selects pseudo-label keypoints written as npz.

TPU-native redesign: homography sampling, warping, the batched forward,
inverse warping, aggregation, NMS and top-k all run on device with
fixed shapes; the host only decodes images and writes npz.

Staging: the chain is split into three separately-jitted programs —
(1) sample+warp for the full warp stack, (2) forward+back-warp+
partial-aggregate per warp chunk (donated accumulators), (3)
aggregate+NMS+top-k.  One fused program is *possible* but XLA's fusion
of the gather-warps into the convolutions exploded both compile time
and runtime; staging keeps each program simple, bounds activation
memory to one chunk, and still keeps every byte on device between
stages.  A single-program mode (``one_dispatch=True``: the same chain
with a ``lax.scan`` over forward/back-warp chunks) was built on the
hypothesis that dispatch round-trips bound sustained throughput on the
high-latency tunnel link — measured FALSE: the async dispatch queue
already hides round-trips, and the scan's chunk transposes cost ~5%
(kernel 29.1→27.5 img/s, sustained 27.5→25.4).  Kept as a tested
option for genuinely enqueue-bound transports.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssp.core.grid import flatten_detection
from ssp.core.homography import inv3, sample_homographies
from ssp.core.warp import compute_valid_mask, inv_warp_image
from ssp.kernels.warp_twopass import inv_warp_image_twopass
from ssp.postprocess.points import extract_keypoints, soft_argmax_refine

log = logging.getLogger(__name__)

DEFAULT_HA = {
    "num": 100,
    "aggregation": "sum",
    "filter_counts": 0,
    "homographies": {
        "params": {
            "translation": True,
            "rotation": True,
            "scaling": True,
            "perspective": True,
            "scaling_amplitude": 0.2,
            "perspective_amplitude_x": 0.2,
            "perspective_amplitude_y": 0.2,
            "allow_artifacts": True,
            "patch_ratio": 0.85,
        }
    },
}


def make_ha_fn(
    apply_fn: Callable,
    variables: Dict[str, Any],
    *,
    num_h: int = 100,
    homography_params: Optional[Dict[str, Any]] = None,
    erosion_radius: int = 3,
    aggregation: str = "sum",
    filter_counts: int = 0,
    top_k: int = 600,
    conf_thresh: float = 0.015,
    nms_radius: int = 4,
    subpixel: bool = False,
    patch_size: int = 5,
    chunk: int = 100,
    use_twopass: bool = True,
    one_dispatch: bool = False,
):
    """Build the per-image-group HA callable.

    Returns ``ha(keys [G], images [G, H, W]) → (pts [G, top_k, 3],
    valid [G, top_k])``.  Also callable with unbatched ``(key,
    image [H, W])``.

    The default composes three jitted stages (module docstring);
    ``one_dispatch=True`` compiles the whole per-group chain — warp
    stack, ``lax.scan`` over forward/back-warp chunks, aggregate, NMS,
    top-k — into ONE XLA program (a group costs a single device
    round-trip, but the scan measures ~5% slower end-to-end even on the
    tunnel link; see module docstring).  Both modes share the same
    math; results agree to fp32 accumulation order.
    """
    h_params = dict(homography_params or DEFAULT_HA["homographies"]["params"])
    chunk = min(chunk, num_h)
    # the gather-based warp runs ~100M samples/s on TPU; the two-pass
    # one-hot warp (ssp/kernels/warp_twopass.py) avoids gathers entirely
    warp = inv_warp_image_twopass if use_twopass else inv_warp_image

    @jax.jit
    def warp_stage(keys: jax.Array, images: jnp.ndarray):
        """[G], [G, H, W] → flat warp stack [G·N, H, W], Hs_inv [G·N, 3, 3]
        (flattening in-stage saves a separate reshape dispatch per group
        — dispatch count is the sustained-throughput limiter on the
        tunnel link)."""

        imgs, Hs_inv = jax.vmap(_sample_warp_one)(keys, images)
        G, N, H_img, W_img = imgs.shape
        return imgs.reshape(G * N, H_img, W_img), Hs_inv.reshape(G * N, 3, 3)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def forward_stage(
        total, counts, maxs,
        imgs: jnp.ndarray, Hs_inv: jnp.ndarray,
        g_idx: jnp.ndarray,
    ):
        """One chunk: forward + back-warp + *in-jit* accumulation into
        the donated per-group accumulators (keeping the accumulation
        inside the jit matters: eager per-chunk adds cost a device
        dispatch each, which dominates on high-latency links).

        Heat and counts are masked by the *same* closed-form
        back-warped valid mask (half-plane test, no resampling), so the
        mean heat's numerator and denominator always agree — masking in
        the warped frame and counting with an original-frame mask
        disagree in the erosion band wherever the warp's local scale
        ≠ 1 (erosion does not commute with the homography).  With
        erosion_radius ≥ 1 the bilinear back-warp's 1-px blend ring at
        the un-eroded boundary lies outside the eroded mask, so no
        padding garbage survives the mask multiply."""
        back, mask_back = _forward_backwarp(imgs, Hs_inv)
        G = total.shape[0]
        total = total + jax.ops.segment_sum(back, g_idx, num_segments=G)
        counts = counts + jax.ops.segment_sum(mask_back, g_idx, num_segments=G)
        if aggregation == "max":
            maxs = jnp.maximum(
                maxs, jax.ops.segment_max(back, g_idx, num_segments=G)
            )
        return total, counts, maxs

    def _finish_impl(total, counts, maxs):
        if aggregation == "max":
            agg = maxs
        else:  # "sum" (mean over contributing warps)
            agg = total / (counts + 1e-6)
        if filter_counts > 0:
            # drop pixels observed by too few warps (reference HA spec,
            # models/homographies.py:87-99)
            agg = jnp.where(counts >= filter_counts, agg, 0.0)

        # suppress on the whole batch (fused Pallas kernel on TPU),
        # then extract per image with NMS already applied
        from ssp.postprocess.nms import batched_nms

        agg_nms = batched_nms(agg, nms_radius, border=4)

        def one(a_nms, a_raw):
            pts, valid = extract_keypoints(
                a_nms, k=top_k, conf_thresh=conf_thresh, nms_radius=0,
                border=0, nms_iterations=1,
            )
            if subpixel:
                pts = soft_argmax_refine(a_raw, pts, patch_size)
            return pts, valid

        return jax.vmap(one)(agg_nms, agg)

    finish_stage = jax.jit(_finish_impl)

    def _sample_warp_one(key, image):
        Hs = sample_homographies(key, num_h - 1, shift=-1.0, **h_params)
        # identity in slot 0 (reference sets H[0]=I, Coco.py:271)
        Hs = jnp.concatenate([jnp.eye(3)[None], Hs], axis=0)
        imgs = jax.vmap(lambda Hm: warp(image[..., None], Hm))(Hs)
        return imgs[..., 0], inv3(Hs)

    def _forward_backwarp(imgs: jnp.ndarray, Hs_inv: jnp.ndarray):
        """Flat [M, H, W] warp chunk → masked back-warped heat + the
        shared closed-form mask (see forward_stage docstring)."""
        out = apply_fn(variables, imgs[..., None], train=False)
        heat = flatten_detection(out["semi"])[..., 0]
        H_img, W_img = heat.shape[-2], heat.shape[-1]
        back = jax.vmap(lambda h, Hm: warp(h[..., None], Hm)[..., 0])(heat, Hs_inv)
        mask_back = jax.vmap(
            lambda Hm: compute_valid_mask((H_img, W_img), Hm, erosion_radius)
        )(Hs_inv)
        return back * mask_back, mask_back

    import functools

    @functools.lru_cache(maxsize=None)
    def _build_one_dispatch(G: int):
        # per-group warps per scan step: the largest divisor of num_h
        # whose flat forward batch G·chunk_n stays within ``chunk`` —
        # exact tiling, no padded warps to mask out
        limit = max(1, chunk // G)
        chunk_n = next(c for c in range(min(num_h, limit), 0, -1) if num_h % c == 0)
        n_chunks = num_h // chunk_n

        @jax.jit
        def ha_one(keys: jax.Array, images: jnp.ndarray):
            H_img, W_img = images.shape[1], images.shape[2]
            imgs_w, Hs_inv = jax.vmap(_sample_warp_one)(keys, images)
            # scan axis first; G stays axis 1 so a data-sharded group
            # keeps every device busy on every scan step (scanning over
            # a flat [G·N] layout would put one whole chunk per device
            # and serialize the mesh)
            imgs_c = imgs_w.reshape(G, n_chunks, chunk_n, H_img, W_img).transpose(
                1, 0, 2, 3, 4
            )
            hs_c = Hs_inv.reshape(G, n_chunks, chunk_n, 3, 3).transpose(1, 0, 2, 3, 4)

            def body(acc, inp):
                total, counts, maxs = acc
                ic, hc = inp
                back, mask = _forward_backwarp(
                    ic.reshape(G * chunk_n, H_img, W_img),
                    hc.reshape(G * chunk_n, 3, 3),
                )
                bg = back.reshape(G, chunk_n, H_img, W_img)
                mg = mask.reshape(G, chunk_n, H_img, W_img)
                total = total + bg.sum(axis=1)
                counts = counts + mg.sum(axis=1)
                if aggregation == "max":
                    maxs = jnp.maximum(maxs, bg.max(axis=1))
                return (total, counts, maxs), None

            z = jnp.zeros((G, H_img, W_img))
            (total, counts, maxs), _ = jax.lax.scan(
                body, (z, z, z), (imgs_c, hs_c)
            )
            return _finish_impl(total, counts, maxs)

        return ha_one

    from functools import partial as _partial

    @_partial(jax.jit, static_argnums=(0, 1, 2))
    def init_acc(G, H_img, W_img):
        z = jnp.zeros((G, H_img, W_img))
        return z, z, z

    def ha(keys: jax.Array, images: jnp.ndarray):
        squeeze = images.ndim == 2
        if squeeze:
            images = images[None]
            keys = keys[None] if keys.ndim else jnp.stack([keys])
        G, H_img, W_img = images.shape
        if one_dispatch:
            pts, valid = _build_one_dispatch(G)(keys, images)
            return (pts[0], valid[0]) if squeeze else (pts, valid)
        imgs_f, hs_f = warp_stage(keys, images)

        total, counts, maxs = init_acc(G, H_img, W_img)
        n_total = G * num_h
        all_g_idx = np.arange(n_total) // num_h
        for s in range(0, n_total, chunk):
            # clamp the final chunk: lax.slice does not tolerate
            # out-of-bounds limits, so a chunk that doesn't divide
            # G·num_h would otherwise crash after the warp stage (the
            # remainder slice compiles one extra forward_stage variant)
            e = min(s + chunk, n_total)
            total, counts, maxs = forward_stage(
                total, counts, maxs,
                jax.lax.slice_in_dim(imgs_f, s, e),
                jax.lax.slice_in_dim(hs_f, s, e),
                jnp.asarray(all_g_idx[s:e]),
            )
        pts, valid = finish_stage(total, counts, maxs)
        return (pts[0], valid[0]) if squeeze else (pts, valid)

    return ha


# one dispatch for a whole group's keys — a per-image fold_in is a
# separate device round-trip each — and MODULE-level so the jit cache
# survives across run_ha_export calls (a per-call closure recompiled
# inside every export run: ~1 s over the tunnel, −25% on short runs).
# fold_in by position, not sequential split: a resumed run must assign
# each image the same homographies a fresh run would.
@jax.jit
def _fold_keys(key, idxs):
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(idxs)


def run_ha_export(
    ha_fn,
    images: Iterable[Tuple[str, np.ndarray]],
    out_dir: Path,
    *,
    seed: int = 0,
    group: int = 1,
    mesh=None,
    depth: int = 3,
) -> int:
    """Drive the export: iterate (name, image) pairs, skip existing npz
    (restartability — reference ``export.py:297-301``), write
    ``<name>.npz`` with ``pts [N, 3]`` (x, y, score).

    ``group`` > 1 processes several images per call; pass a ``mesh`` to
    shard the group over its ``data`` axis (each device runs whole
    images — the reference's DataParallel split one image's warp stack
    instead, ``export.py:260``).

    ``depth`` is the software-pipeline depth: results are fetched
    ``depth`` groups after they were dispatched.  On the tunnel link a
    blocking fetch drains the dispatch queue — fetching the group that
    was just computed costs a full round-trip of dead device time per
    group (measured 28.5 → 21.8 img/s at depth 1); by the time a
    depth-3-late fetch happens the bytes are already on the host
    (``copy_to_host_async``) and the queue stays full.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    count = 0
    key = jax.random.key(seed)

    sharding = None
    if mesh is not None and group > 1:
        from ssp.parallel import batch_sharding

        sharding = batch_sharding(mesh)

    # Multi-host pods (jax.distributed): every process iterates the
    # SAME image list (deterministic order), each builds only its local
    # rows of the group, the global array spans hosts via
    # make_array_from_process_local_data, and each host writes the npz
    # for its own rows — no cross-host result gather (SURVEY §2.7; the
    # production pod export lane, tests/multiproc_ha_worker.py).
    nproc = jax.process_count()
    multiproc = sharding is not None and nproc > 1
    if multiproc:
        if group % nproc:
            raise ValueError(f"group {group} must divide over {nproc} processes")
        # global row indices this process's devices own, ascending —
        # derived from the sharding, NOT assumed contiguous (the global
        # device order interleaves processes on some backends, so a
        # [pid*g_local : ...] block slice scatters wrong rows)
        idx_map = sharding.addressable_devices_indices_map((group,))
        blocks = sorted(
            (sl[0].start or 0,
             group if sl[0].stop is None else sl[0].stop)
            for sl in idx_map.values()
        )
        my_rows = [r for lo, hi in blocks for r in range(lo, hi)]

    def group_iter():
        pending: list = []
        for idx, (name, img) in enumerate(images):
            if (out_dir / f"{name}.npz").exists():
                continue
            # fold_in by position, not sequential split: a resumed run
            # must assign each image the same homographies a fresh run
            # would (skipped images consume no PRNG state)
            pending.append((name, img, idx))
            if len(pending) >= group:
                yield pending
                pending = []
        if pending:
            yield pending

    def stage(pending):
        """Stack a group on the host and START its device transfer —
        issued before the previous group's compute drains, so the
        host→device copy rides under compute instead of serializing
        with it (the transfer, not the stack, is what a high-latency
        link charges for)."""
        n_real = len(pending)
        padded = pending + [pending[-1]] * (group - n_real)
        # idxs as a HOST array: an eager jnp.asarray is a device op
        # that queues behind in-flight compute groups — on the tunnel
        # that blocked the host ~58 ms/group (measured −6 img/s)
        idxs = np.asarray([i for _, _, i in padded])
        if multiproc:
            # local rows only (in ascending global-index order); raw
            # uint32 key data crosses the process-local→global
            # boundary (typed key arrays don't)
            raw = np.asarray(jax.random.key_data(
                _fold_keys(key, idxs[my_rows])))
            imgs_l = np.stack([np.asarray(padded[r][1]) for r in my_rows])
            keys = jax.make_array_from_process_local_data(
                sharding, raw, (group, *raw.shape[1:]))
            imgs = jax.make_array_from_process_local_data(
                sharding, imgs_l, (group, *imgs_l.shape[1:]))
        else:
            keys = _fold_keys(key, idxs)
            # host-side stack, one transfer (a jnp.stack of numpy
            # arrays is a device_put per element plus a concat dispatch)
            imgs = np.stack([np.asarray(i) for _, i, _ in padded])
            if sharding is not None:
                keys = jax.device_put(keys, sharding)
                imgs = jax.device_put(imgs, sharding)
            else:
                imgs = jax.device_put(imgs)  # async; commits off the hot path
        return [n for n, _, _ in padded[:n_real]], keys, imgs, n_real

    def _local_rows(arr):
        """Host copy of the ``my_rows`` global rows of ``arr``, pulled
        from whichever addressable shard holds each (the *output*
        sharding is GSPMD's choice — the aggregation/top-k stages can
        leave results replicated or resharded, so never assume the
        input's row partitioning survived)."""
        found = {}
        n = arr.shape[0]
        for s in arr.addressable_shards:
            sl = s.index[0] if s.index else slice(None)
            lo = sl.start or 0
            hi = n if sl.stop is None else sl.stop
            data = None
            for r in my_rows:
                if r not in found and lo <= r < hi:
                    if data is None:
                        data = np.asarray(s.data)
                    found[r] = data[r - lo]
        missing = [r for r in my_rows if r not in found]
        if missing:
            raise RuntimeError(
                f"rows {missing} not addressable from process "
                f"{jax.process_index()} (output sharding left them on "
                "remote hosts — constrain the export output sharding)")
        return [found[r] for r in my_rows]

    def write_out(names, pts_b, valid_b):
        nonlocal count
        if multiproc:
            # each host writes only its own rows (results never cross
            # DCN); padded rows carry indices >= len(names)
            pts_l, valid_l = _local_rows(pts_b), _local_rows(valid_b)
            for j, gidx in enumerate(my_rows):
                if gidx >= len(names):
                    continue
                _write(out_dir / f"{names[gidx]}.npz", pts_l[j], valid_l[j])
                count += 1
            return
        # ONE transfer for the whole group: iterating the device arrays
        # would device_get per image row — 2·G round-trips per group,
        # which on the tunnel link costs more than the group's compute
        pts_b, valid_b = jax.device_get((pts_b, valid_b))
        for name, pts, valid in zip(names, pts_b, valid_b):
            _write(out_dir / f"{name}.npz", pts, valid)
            count += 1

    # software pipeline, ``depth`` result groups in flight:
    #   transfer(i+1)  ∥  compute(i)  ∥  npz-write(i−depth)
    # npz writes force a device-result fetch; fetching the group that
    # just computed leaves the device idle for a tunnel round-trip per
    # group (measured −23% sustained), so fetches lag dispatch by
    # ``depth`` groups — the async copy-back has landed by then and the
    # device queue never drains.  Results are ~top_k·3 floats/image, so
    # holding a few groups is free.
    from collections import deque

    def compute(staged):
        names, keys, imgs, n_real = staged
        if multiproc:
            keys = jax.random.wrap_key_data(keys)
        pts_b, valid_b = ha_fn(keys, imgs)  # async — no sync here
        if n_real != group and not multiproc:
            # slicing device arrays costs a dispatch; in multiproc the
            # padded rows are dropped host-side in write_out instead
            # (a global-array slice would reshard across hosts)
            pts_b, valid_b = pts_b[:n_real], valid_b[:n_real]
        for a in (pts_b, valid_b):  # start result copy-back early
            getattr(a, "copy_to_host_async", lambda: None)()
        return names, pts_b, valid_b

    inflight: deque = deque()
    staged = None
    for nxt in group_iter():
        if staged is not None:
            inflight.append(compute(staged))
        staged = stage(nxt)
        while len(inflight) > depth:
            write_out(*inflight.popleft())
    if staged is not None:
        inflight.append(compute(staged))
    while inflight:
        write_out(*inflight.popleft())
    return count


def _write(path: Path, pts, valid) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    pts = np.asarray(jax.device_get(pts))
    valid = np.asarray(jax.device_get(valid))
    np.savez_compressed(path, pts=pts[valid])
