"""Histogram AGC: per-line BLACK/WHITE level detection.

Port of Binarizer::findBlackWhite and its helpers (binarizer.cpp:
2450-3551): brightness histogram, noise-filtered useful span, peak search
with early-stop distance windows, contrast/validity checks.

TPU formulation: per-line histograms are one one-hot matmul
(pixels [N, W] -> hist [N, 256] on the MXU); the 256-step peak scans
vectorize across lines. A numpy twin drives host-side slow paths.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# bin_preset_t defaults (binarizer.h:163-186, fine_bin_set defaults).
MAX_BLACK_LVL = 118
MIN_WHITE_LVL = 132
MIN_CONTRAST = 8
MIN_REF_LVL = 2
MAX_REF_LVL = 254
MIN_VALID_CRCS = 3
MARK_MAX_DIST = 15  # percent of line width for marker zones


@dataclass
class BinPreset:
    """Binarizer fine settings (bin_preset_t, binarizer.h:163-186)."""
    max_black_lvl: int = MAX_BLACK_LVL
    min_white_lvl: int = MIN_WHITE_LVL
    min_contrast: int = MIN_CONTRAST
    min_ref_lvl: int = MIN_REF_LVL
    max_ref_lvl: int = MAX_REF_LVL
    min_valid_crcs: int = MIN_VALID_CRCS
    mark_max_dist: int = MARK_MAX_DIST
    en_good_no_marker: bool = False
    en_force_coords: bool = False
    left_bit_pick: int = 6
    right_bit_pick: int = 6


def line_histograms(pixels: np.ndarray, lo: np.ndarray, hi: np.ndarray):
    """Per-line histogram of pixels[i, lo[i]:hi[i]] -> [N, 256]."""
    N, W = pixels.shape
    idx = np.arange(W)[None, :]
    mask = (idx >= lo[:, None]) & (idx < hi[:, None])
    hist = np.zeros((N, 256), dtype=np.int64)
    for i in range(N):
        hist[i] = np.bincount(pixels[i][mask[i]], minlength=256)
    return hist


def _useful_levels(hist: np.ndarray, preset: BinPreset):
    """getUsefullLowLevel / getUsefullHighLevel (binarizer.cpp:2471-2560)."""
    N = hist.shape[0]
    peak = hist.max(axis=-1)
    min_freq = peak // 64
    lv = np.arange(256)[None, :]
    # low: first level < max_black_lvl with count > min_freq (fallback > 0)
    in_lo = lv < preset.max_black_lvl
    cand = (hist > min_freq[:, None]) & in_lo
    cand_fb = (hist > 0) & in_lo
    low = np.where(cand.any(-1), cand.argmax(-1),
                   np.where(cand_fb.any(-1), cand_fb.argmax(-1), 0))
    # high: last level >= min_white_lvl with count > min_freq
    in_hi = lv >= preset.min_white_lvl
    candh = (hist > min_freq[:, None]) & in_hi
    candh_fb = (hist > 0) & in_hi
    rev = lambda m: 255 - m[:, ::-1].argmax(-1)
    high = np.where(candh.any(-1), rev(candh),
                    np.where(candh_fb.any(-1), rev(candh_fb), 255))
    return low.astype(np.int64), high.astype(np.int64)


def _peak_scan(hist, start, stop_limit, min_count, delta, upward=True):
    """Peak search with early-stop window (findBlackWhite :3235-3330).

    Scans from `start` toward `stop_limit` (inclusive), tracking the max
    count; once a qualifying peak is found, stops when the scan moves
    `delta` past it. Vectorized over lines with a 256-step loop.
    """
    N = len(start)
    best = np.full(N, -1, dtype=np.int64)
    best_cnt = np.zeros(N, dtype=np.int64)
    found = np.zeros(N, dtype=bool)
    stopped = np.zeros(N, dtype=bool)
    pos = start.copy()
    for _ in range(256):
        active = ~stopped & (pos <= stop_limit if upward
                             else pos >= stop_limit)
        if not active.any():
            break
        cnt = hist[np.arange(N), np.clip(pos, 0, 255)]
        better = active & (cnt > best_cnt)
        best_cnt = np.where(better, cnt, best_cnt)
        qualifies = better & (cnt > min_count)
        best = np.where(qualifies, pos, best)
        found = found | qualifies
        dist = np.abs(pos - best)
        stopped = stopped | (active & found & (dist >= delta))
        pos = pos + (1 if upward else -1)
    return best, found


def find_black_white(pixels: np.ndarray, preset: BinPreset | None = None,
                     do_sweep=False):
    """Generic findBlackWhite: returns (black [N], white [N], ok [N]).

    Histogram region: central part of the line with /16 margins
    (binarizer.cpp:3152-3166 generic path). Format-specific marker-zone
    refinements (findSTC007BW etc.) layer on top for noisy captures.
    """
    preset = preset or BinPreset()
    N, W = pixels.shape
    margin = W // 16
    lo = np.full(N, margin, dtype=np.int64)
    hi = np.full(N, W - margin, dtype=np.int64)
    hist = line_histograms(pixels, lo, hi)
    useful_low, useful_high = _useful_levels(hist, preset)
    rng = useful_high - useful_low
    low_limit = useful_low + rng // 3
    high_limit = useful_high - rng // 3
    d_black = (rng * 10) // 100
    d_white = (rng * 12) // 100
    min_count = hist.max(axis=-1) // 64

    black, black_ok = _peak_scan(hist, useful_low, low_limit, min_count,
                                 np.maximum(d_black, 1), upward=True)
    black = np.where(black_ok, black, useful_low)
    white, white_ok = _peak_scan(hist, useful_high,
                                 np.maximum(high_limit,
                                            black + preset.min_contrast),
                                 min_count, np.maximum(d_white, 1),
                                 upward=False)
    white = np.where(white_ok, white, useful_high)
    ok = black_ok & white_ok
    # Validity checks (findBlackWhite :3345-3420).
    bad = ((white < black)
           | ((white - black) < preset.min_contrast)
           | (black > preset.max_black_lvl)
           | (white < preset.min_white_lvl))
    if do_sweep:
        bad |= (white - black) < preset.min_valid_crcs
    ok = ok & ~bad
    black = np.where(ok, black, useful_low)
    white = np.where(ok, white, useful_high)
    return black, white, ok
