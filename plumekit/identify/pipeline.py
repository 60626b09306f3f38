"""The shared device pipeline behind the rg and gaussian detectors.

The reference's hot loop is: per threshold, build a binary mask, clean
singletons, run full-image connected components, then per fire find the
nearest component within a window and record its size; afterwards pick, per
fire, the threshold *before the plume merges into background* and re-extract
and vet the plume mask (``plume_identifier_rg.py:137-234, 357-457``;
``plume_identifier_gaussian_profile.py:142-240, 243-332``). That is 20+
python-level ``skimage.label`` calls per scene.

TPU-native re-expression: the entire threshold sweep is one jitted XLA
program —

* masks for all T thresholds as a (T, H, W) tensor;
* morphology broadcast over T; CCL via ``lax.map`` per threshold so each
  pays only its own sweep count (CCL is pointer-jumping segmented-scan label
  propagation, :mod:`plumekit.ops.ccl`);
* component sizes via one ``segment_sum`` per threshold;
* per-(threshold, fire) nearest-label window lookups vmapped over both axes;
* the threshold-index rule and the acceptance gates (area bounds, AOD max,
  principal-axis ratio, transect peak count, optional null fraction) as
  vectorised masked arithmetic over the fixed fire capacity.

Fires and plumes are ragged in reality; here they ride fixed-capacity arrays
with validity masks so the program compiles once per scene shape
(SURVEY.md §7 hard part #4).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from plumekit.ops.ccl import ccl_backend, connected_components
from plumekit.ops.morphology import binary_opening_cross, binary_dilation_square
from plumekit.ops.segment import (
    label_window_nearest,
    masked_bbox,
    masked_centroid,
    masked_moments_cov,
)
from plumekit.ops.geometry import principal_axes
from plumekit.ops.transect import (
    count_peaks_masked,
    line_transect,
    line_transect_in_mask,
    savgol_smooth,
)


@dataclass(frozen=True)
class SweepStatics:
    """Static (compile-time) parameters of the sweep pipeline."""

    win_half: int
    min_plume_pixels: int
    max_plume_pixels: int
    max_lim: float               # min acceptable in-plume AOD max
    axis_ratio: float            # rg SIDE_RATIO=5 / gaussian MIN_AXIS_RATIO=8
    max_peaks: int               # rg 1 / gaussian 3
    n_transect: int
    savgol_window: int = 0       # 0 = no smoothing (gaussian variant)
    savgol_polyorder: int = 3
    check_null: bool = False     # gaussian CHECK 4
    max_invalid_frac: float = 0.2
    use_mask_b: bool = True      # rg also evaluates threshold_index - 1
    pick_larger_mask: bool = True     # CompatFlags.pick_larger_mask
    reject_last_threshold: bool = True  # CompatFlags.reject_last_threshold
    dilate_plume_px: int = 0     # gaussian buffers final mask by 5x5


def validate_descending_thresholds(thresholds) -> np.ndarray:
    """The sweep's warm-started CCL (both the XLA scan and the Pallas
    kernel) requires *strictly descending* thresholds so the opened masks
    nest; a non-monotone user-supplied tuple would silently produce wrong
    labels. Called by every detector before entering the jitted program."""
    t = np.asarray(thresholds, dtype=np.float32)
    if t.ndim != 1 or t.size < 2 or not np.all(np.diff(t) < 0):
        raise ValueError(
            "threshold sweep requires >=2 strictly descending thresholds "
            f"(nested-mask invariant of the warm-started CCL); got {t!r}"
        )
    return t


def _threshold_index(extents, reject_last: bool):
    """Per-fire best threshold index — ``find_threshold_index``
    (``plume_identifier_rg.py:198-234``) vectorised.

    ``extents``: (T,) plume sizes over descending thresholds. Returns
    (index, has_index).
    """
    t = extents.shape[0]
    prev = extents[:-1].astype(jnp.float32)
    nxt = extents[1:].astype(jnp.float32)
    is_nan = prev == 0
    ratios = jnp.where(is_nan, -jnp.inf, nxt / jnp.maximum(prev, 1.0))
    all_nan = jnp.all(is_nan)
    argmax = jnp.argmax(ratios)  # first max, matching np.nanargmax

    any_nan = jnp.any(is_nan)
    # index of the last nan entry (only meaningful when any_nan)
    rev_first = jnp.argmax(is_nan[::-1])
    last_nan = (t - 2) - rev_first
    first_non_nan_reject = any_nan & (argmax == last_nan + 1)

    last_reject = jnp.bool_(False)
    if reject_last:
        # intended behavior: reject when the max ratio sits at the last entry
        # (the committed comparison `argmax == ratios.size` is unreachable,
        # SURVEY.md bug #4)
        last_reject = argmax == (t - 2)

    has = ~all_nan & ~first_non_nan_reject & ~last_reject
    return argmax.astype(jnp.int32), has


def make_sweep_identifier(statics: SweepStatics, jit: bool = True):
    """Build the jitted sweep program for a given static configuration.

    Returns ``fn(aod, raw_aod, null_mask, thresholds, fire_rows, fire_cols,
    fire_valid) -> dict`` where

    * ``aod`` is the detection field (interpolated AOD for the gaussian
      variant, raw for rg);
    * ``raw_aod`` is the field used for in-plume statistics (rg uses raw;
      gaussian passes the interpolated field for both);
    * ``thresholds`` is a (T,) descending float array;
    * fire arrays are fixed capacity (F,) with a validity mask.

    Output dict (all fixed shape): ``accepted`` (F,), ``mask`` (F, H, W),
    ``t_index``, ``label``, ``area``, ``aod_mean``, ``aod_sd``, ``bbox``
    (F, 4), ``extents`` (T, F).
    """
    s = statics

    def assess_at(labels_all, sizes_tf, aod_det, aod_stat, null_mask,
                  t_idx, f_idx, r, c):
        """Vet the plume for one fire at one (dynamic) threshold index.

        Mirrors ``find_plume_mask``+``assess_plume``+``check_plume_profile``
        (``plume_identifier_rg.py:237-354``). ``sizes_tf`` is the (T, F)
        per-fire component-size table (the fire's window label re-derived
        here equals the one the table was built from).
        """
        lab_img = labels_all[t_idx]
        label, found = label_window_nearest(lab_img, r, c, s.win_half)
        mask = (lab_img == label) & found
        area = jnp.where(found, sizes_tf[t_idx, f_idx], 0)

        ok = found
        ok &= area >= s.min_plume_pixels          # CHECK 1
        ok &= area <= s.max_plume_pixels          # CHECK 2
        aod_in = jnp.where(mask, aod_stat, -jnp.inf)
        aod_max = jnp.max(aod_in)
        ok &= aod_max >= s.max_lim                # CHECK 3

        if s.check_null:                          # gaussian CHECK 4
            n_null = jnp.sum(null_mask & mask)
            frac = n_null / jnp.maximum(area, 1)
            ok &= frac <= s.max_invalid_frac

        # principal axes (CHECK 4/5): variance-scaled axis lengths,
        # reference parity (plume_identifier_rg.py:285-302)
        c_rr, c_rc, c_cc, _n = masked_moments_cov(mask)
        d_major, d_minor, _v_major, v_minor = principal_axes(c_rr, c_rc, c_cc)
        ratio = d_major / jnp.maximum(d_minor, 1e-12)
        ok &= ratio >= s.axis_ratio

        # transect profile (CHECK 5/6)
        min_r, min_c, max_r, max_c = masked_bbox(mask)
        mr, mcarr = masked_centroid(mask)
        # minor-axis line: slope dy/dx of the eigvec; division by ~0 yields
        # inf and an empty kept-run, reproducing the reference's reject-path
        slope = v_minor[0] / v_minor[1]
        y1 = mr + 0.5 * d_minor * v_minor[0]
        x1 = mcarr + 0.5 * d_minor * v_minor[1]
        intercept = y1 - x1 * slope

        if s.savgol_window:
            samples, valid = line_transect(
                aod_det, slope, intercept,
                min_r.astype(jnp.float32), min_c.astype(jnp.float32),
                max_r.astype(jnp.float32), max_c.astype(jnp.float32),
                n_samples=s.n_transect,
            )
            smoothed, sg_ok = savgol_smooth(
                samples, valid, s.savgol_window, s.savgol_polyorder
            )
            n_peaks = count_peaks_masked(smoothed, valid, _flat_tol(smoothed, valid))
            ok &= sg_ok                      # scipy raise → except → reject
            ok &= n_peaks <= s.max_peaks
        else:
            samples, valid = line_transect_in_mask(
                aod_det, mask, slope, intercept,
                min_r.astype(jnp.float32), min_c.astype(jnp.float32),
                max_r.astype(jnp.float32), max_c.astype(jnp.float32),
                n_samples=s.n_transect,
            )
            n_peaks = count_peaks_masked(samples, valid, _flat_tol(samples, valid))
            ok &= n_peaks <= s.max_peaks

        stats_n = jnp.maximum(area, 1)
        mean = jnp.sum(jnp.where(mask, aod_stat, 0.0)) / stats_n
        sq = jnp.sum(jnp.where(mask, (aod_stat - mean) ** 2, 0.0)) / stats_n
        sd = jnp.sqrt(sq)

        gates = jnp.stack(
            [found, area >= s.min_plume_pixels, area <= s.max_plume_pixels,
             aod_max >= s.max_lim, ratio >= s.axis_ratio,
             n_peaks <= s.max_peaks]
        )
        dbg = jnp.stack([slope, intercept, jnp.float32(d_minor),
                         jnp.float32(d_major)])
        return dict(
            ok=ok, mask=mask, label=label, area=area,
            aod_mean=mean, aod_sd=sd,
            bbox=jnp.stack([min_r, min_c, max_r, max_c]),
            gates=gates, n_peaks=n_peaks, dbg=dbg,
        )

    def fn(aod_det, aod_stat, null_mask, thresholds, fire_rows, fire_cols,
           fire_valid):
        t_count = thresholds.shape[0]
        f_count = fire_rows.shape[0]
        h, w = aod_det.shape

        # Thresholds are descending, so opened[0] ⊆ opened[1] ⊆ … (opening
        # is monotone): label tightest→loosest, warm-starting each level
        # from the previous level's labels. On TPU the whole stack runs as
        # ONE Pallas program — round 5: the BANDED fused-mask kernel
        # (ops/pallas/ccl_banded.py) builds the threshold masks and the
        # cross opening in-kernel from the raw AOD (the (T, H, W) opened
        # stack never materialises), keeps the label plane in HBM (no
        # VMEM scene gate — 8192²+ swaths label on-device), and measured
        # the fused-mask build runs in BOTH variants: the VMEM-resident
        # kernel (multi_threshold_ccl_fused) inside its ~5000² gate, the
        # banded kernel beyond it. PLUMEKIT_CCL=unfused restores the
        # round-4 opened-stack kernel (XLA scan beyond the VMEM gate —
        # there is no unfused banded variant); =xla the scan path. Both
        # flags are baked in at trace time (see ccl_backend's caveat).
        from plumekit.ops.ccl import ccl_unfused
        from plumekit.ops.pallas.ccl_sweep import (
            multi_threshold_ccl, sweep_fits_vmem)

        backend = ccl_backend()
        unfused = ccl_unfused()
        if backend == "pallas" and unfused and not sweep_fits_vmem(h, w):
            backend = "xla"  # escape hatch must actually escape
        if backend == "pallas" and sweep_fits_vmem(h, w) and not unfused:
            from plumekit.ops.pallas.ccl_sweep import (
                multi_threshold_ccl_fused)

            labels_all = multi_threshold_ccl_fused(
                aod_det, thresholds, connectivity=2)
        elif backend == "pallas" and not sweep_fits_vmem(h, w):
            from plumekit.ops.pallas.ccl_banded import (
                multi_threshold_ccl_banded)

            labels_all = multi_threshold_ccl_banded(
                aod_det, thresholds, connectivity=2)
        elif backend == "pallas":
            masks = aod_det[None, :, :] > thresholds[:, None, None]
            opened = binary_opening_cross(masks)
            labels_all = multi_threshold_ccl(opened, connectivity=2)
        else:
            masks = aod_det[None, :, :] > thresholds[:, None, None]
            opened = binary_opening_cross(masks)
            # XLA fallback: lax.scan of warm-started labelings (NOT vmap —
            # a batched while_loop would make every threshold pay the
            # slowest percolation level's sweep count)
            def label_one(prev, m):
                lbl = connected_components(m, connectivity=2,
                                           init_labels=prev)
                return lbl, lbl

            _, labels_all = jax.lax.scan(
                label_one, jnp.zeros((h, w), jnp.int32), opened
            )

        # (T, F) nearest labels + found flags. One (T, size, size) slab
        # slice per FIRE (the window is threshold-independent) instead of
        # T·F independent 2-D window gathers: the vmapped-over-both-axes
        # form lowered to a ~15 ms fixed-cost gather at every scene size
        # (round-4 stage attribution); the slab form is F contiguous
        # 3-D dynamic slices
        size = 2 * s.win_half + 1
        from plumekit.ops.segment import window_label_from

        def fire_windows(r, c):
            sr = jnp.clip(r - s.win_half, 0, h - size)
            sc = jnp.clip(c - s.win_half, 0, w - size)
            slab = lax.dynamic_slice(labels_all, (0, sr, sc),
                                     (t_count, size, size))
            return jax.vmap(
                lambda win: window_label_from(win, r, c, sr, sc))(slab)

        lab_ft, found_ft = jax.vmap(fire_windows)(fire_rows, fire_cols)
        lab_tf, found_tf = lab_ft.T, found_ft.T

        # per-(threshold, fire) component sizes as masked counts. On TPU
        # the Pallas kernel streams each label plane ONCE with all F
        # accumulators in VMEM (round-4: the XLA form's T·F fused
        # compare+reduces measured as a fixed ~14 ms/scene); elsewhere the
        # XLA form stands — F scalar comparisons fused over one pass of
        # each label image (the former H·W+1-segment ``segment_sum`` size
        # map lowers to a giant scatter on TPU; only ≤ T·F sizes are read)
        from plumekit.ops.pallas.label_counts import pick_block

        if (ccl_backend() == "pallas" and f_count <= 128
                and pick_block(w) is not None):
            from plumekit.ops.pallas.label_counts import fire_label_counts

            sizes_tf = fire_label_counts(labels_all, lab_tf)  # (T, F)
        else:
            def sizes_one(lab_img, labs):
                eq = lab_img[None, :, :] == labs[:, None, None]
                return jnp.sum(eq, axis=(1, 2), dtype=jnp.int32)

            sizes_tf = jax.vmap(sizes_one)(labels_all, lab_tf)  # (T, F)
        extents = jnp.where(
            found_tf & fire_valid[None, :], sizes_tf, 0
        )  # (T, F)

        t_idx, has_idx = jax.vmap(
            lambda e: _threshold_index(e, s.reject_last_threshold),
            in_axes=1,
        )(extents)
        has_idx &= fire_valid

        def per_fire(ti, f_idx, r, c):
            if not s.use_mask_b:
                res_a = assess_at(
                    labels_all, sizes_tf, aod_det, aod_stat, null_mask, ti,
                    f_idx, r, c
                )
                return res_a | {"t_used": ti}
            # python negative indexing wrap: THRESHOLD_SET[idx-1] with idx=0
            # reads the *last* threshold (committed reference behavior,
            # plume_identifier_rg.py:386)
            ti_b = jnp.where(ti - 1 < 0, t_count - 1, ti - 1)
            # ONE vmapped assessment for both candidate thresholds instead
            # of two sequential calls: on the relay runtime every EXECUTED
            # HLO op costs ~45 µs of dispatch, so halving the assess
            # phase's op count (each op now carries the (a, b) pair on a
            # leading axis) cuts directly into the ~21 ms/scene residual
            # the round-3 VERDICT flagged (#6); values are unchanged
            res2 = jax.vmap(
                lambda tix: assess_at(labels_all, sizes_tf, aod_det,
                                      aod_stat, null_mask, tix, f_idx, r, c)
            )(jnp.stack([ti, ti_b]))
            res_a = jax.tree_util.tree_map(lambda x: x[0], res2)
            res_b = jax.tree_util.tree_map(lambda x: x[1], res2)
            sum_a = jnp.sum(res_a["mask"])
            sum_b = jnp.sum(res_b["mask"])
            if s.pick_larger_mask:
                prefer_a = sum_a > sum_b
            else:
                prefer_a = sum_a <= sum_b
            both = res_a["ok"] & res_b["ok"]
            use_a = jnp.where(both, prefer_a, res_a["ok"])
            out = {}
            for k in ("mask", "label", "area", "aod_mean", "aod_sd", "bbox"):
                av, bv = res_a[k], res_b[k]
                if av.ndim:
                    shaped = use_a.reshape((1,) * av.ndim)
                    out[k] = jnp.where(shaped, av, bv)
                else:
                    out[k] = jnp.where(use_a, av, bv)
            out["ok"] = res_a["ok"] | res_b["ok"]
            out["t_used"] = jnp.where(use_a, ti, ti_b)
            out["gates_a"] = res_a["gates"]
            out["gates_b"] = res_b["gates"]
            out["n_peaks_a"] = res_a["n_peaks"]
            out["n_peaks_b"] = res_b["n_peaks"]
            out["dbg_a"] = res_a["dbg"]
            out["dbg_b"] = res_b["dbg"]
            return out

        res = jax.vmap(per_fire)(t_idx, jnp.arange(f_count), fire_rows,
                                 fire_cols)
        accepted = res["ok"] & has_idx
        mask = res["mask"] & accepted[:, None, None]
        if s.dilate_plume_px:
            mask = binary_dilation_square(mask, s.dilate_plume_px)

        ret = dict(
            accepted=accepted,
            mask=mask,
            t_index=t_idx,
            t_used=res["t_used"],
            label=res["label"],
            area=res["area"],
            aod_mean=res["aod_mean"],
            aod_sd=res["aod_sd"],
            bbox=res["bbox"],
            extents=extents,
        )
        for k in ("gates_a", "gates_b", "n_peaks_a", "n_peaks_b", "gates",
                  "n_peaks", "dbg_a", "dbg_b", "dbg"):
            if k in res:
                ret[k] = res[k]
        return ret

    if not jit:
        return fn
    return jax.jit(fn)


def _flat_tol(values, valid):
    """A few-ULP flatness tolerance for fp32 peak counting: 32 eps of the
    valid dynamic range (see :func:`count_peaks_masked`)."""
    vmax = jnp.max(jnp.where(valid, values, -jnp.inf))
    vmin = jnp.min(jnp.where(valid, values, jnp.inf))
    rng = jnp.where(jnp.isfinite(vmax - vmin), vmax - vmin, 0.0)
    return 32.0 * jnp.float32(1.1920929e-7) * rng


@lru_cache(maxsize=32)
def cached_sweep_identifier(statics: SweepStatics):
    return make_sweep_identifier(statics)


@lru_cache(maxsize=32)
def cached_batch_sweep_identifier(statics: SweepStatics):
    """Single-device G-scene variant: ``fn(aods (G,H,W), nulls (G,H,W),
    thresholds (T,), rows (G,F), cols (G,F), valid (G,F)) -> dict of
    stacked outputs`` — G scenes' sweeps in ONE dispatched program.

    ``lax.map`` (sequential), not vmap: each scene's CCL ``while_loop``
    runs its own iteration count; a vmapped while_loop would make every
    scene pay the slowest one's sweep count. Per-scene results are
    bit-identical to :func:`cached_sweep_identifier` on the same scene
    (same program body, mapped). Measured on the tunneled v5e: 72.9 →
    65.2 ms/scene at G=8 (BASELINE.md round 3) — the residual per-program
    dispatch tax after the CCL megakernel already collapsed the op count."""
    sweep = make_sweep_identifier(statics, jit=False)

    def batched(aods, nulls, thresholds, rows, cols, valid):
        def one(args):
            aod, null, r, c, v = args
            return sweep(aod, aod, null, thresholds, r, c, v)

        return jax.lax.map(one, (aods, nulls, rows, cols, valid))

    return jax.jit(batched)
