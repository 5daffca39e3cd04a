"""Audio finishing chain: dropout classification + masking + WAV routing.

Port of the reference AudioProcessor (audioprocessor.{h,cpp}): per-channel
invalid-region detection, stray-valid-island invalidation
(fixStraySamples :268-495), region splitting into ramp-down / mute /
ramp-up for long dropouts (fixBadSamples :740-1200), and the three masking
families mute / level-hold / linear-interpolation in x16 fixed point
(rangeMute :511, rangeLevelHold :571, rangeLinearInterpolation :635).

Re-architected for batch decoding: instead of a 512-pair sliding window
(BUF_SIZE audioprocessor.h:69) the masking operates on whole capture
chunks at once with numpy run-length analysis — the reference's windowing
exists only to bound memory on a live stream.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# Masking modes (audioprocessor.h:86-95).
(DROP_IGNORE, DROP_MUTE_BLOCK, DROP_MUTE_WORD, DROP_HOLD_BLOCK,
 DROP_HOLD_WORD, DROP_INTER_LIN_BLOCK, DROP_INTER_LIN_WORD) = range(7)

MIN_LONG_INVALID = 16     # audioprocessor.h:70
MAX_STRAY_LEN = 24        # :71 (island window check uses 0 < delta < 28)
MIN_VALID_BEFORE = 3
MAX_RAMP_DOWN = 192       # :73
MAX_RAMP_UP = 32          # :74
CALC_MULT = 16            # :79-83


def _runs(mask: np.ndarray):
    """Maximal True runs as (starts, stops_inclusive) index arrays."""
    if len(mask) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    d = np.diff(mask.astype(np.int8))
    starts = np.nonzero(d == 1)[0] + 1
    stops = np.nonzero(d == -1)[0]
    if mask[0]:
        starts = np.concatenate([[0], starts])
    if mask[-1]:
        stops = np.concatenate([stops, [len(mask) - 1]])
    return starts.astype(np.int64), stops.astype(np.int64)


def invalidate_stray_samples(valid: np.ndarray):
    """fixStraySamples: valid islands (<28 long) between long invalid
    regions become invalid too. Mutates and returns `valid`."""
    n = len(valid)
    if n == 0:
        return valid
    # Long invalid regions; scan starts at index 1 (first sample is kept).
    inv = ~valid.copy()
    inv[0] = False
    rs, re = _runs(inv)
    length = re - rs + 1
    tail = re == n - 1
    # Reference counts `(queue_idx-start_idx) > 16` with queue_idx the
    # first valid AFTER the run; tail regions use size-start-1.
    is_long = np.where(tail, length - 1, length) > MIN_LONG_INVALID
    ls, le = rs[is_long], re[is_long]
    if len(ls) > 1:
        # Valid islands between consecutive long regions (a tail run can
        # only be last, so the gap start is always the earlier run's end).
        e1, s2 = le[:-1], ls[1:]
        delta = s2 - e1
        hit = (delta > 0) & (delta < MAX_STRAY_LEN + 4)
        if hit.any():
            ev = np.zeros(n + 1, np.int64)
            np.add.at(ev, e1[hit], 1)
            np.add.at(ev, s2[hit] + 1, -1)
            valid[np.cumsum(ev[:-1]) > 0] = False
    return valid


@dataclass
class MaskStats:
    masked_samples: int = 0
    regions: int = 0


def mask_channel(values: np.ndarray, valid: np.ndarray, mask_mode: int,
                 max_ramp_down=MAX_RAMP_DOWN, max_ramp_up=MAX_RAMP_UP,
                 file_end=True):
    """fixBadSamples + range maskers for one channel (batch form).

    values int array (mutated), valid bool array (mutated: everything
    becomes valid after masking). Returns MaskStats.

    All regions mask in one vectorized pass (a dropout-heavy tape has
    tens of thousands of regions; the per-region form below,
    _mask_channel_serial, stays as the tested reference).
    """
    n = len(values)
    if n == 0 or mask_mode == DROP_IGNORE:
        valid[:] = True
        return MaskStats()
    stats = MaskStats()
    s, e = _runs(~valid)
    if len(s) == 0:
        return stats

    # Leading run: mute (no valid anchor before it).
    if s[0] == 0:
        values[0:e[0] + 1] = 0
        valid[0:e[0] + 1] = True
        stats.masked_samples += int(e[0]) + 1
        s, e = s[1:], e[1:]
    # Trailing run at EOF.
    tail_region = None
    if len(s) and e[-1] == n - 1:
        if file_end:
            values[n - 1] = 0
            valid[n - 1] = True
            tail_region = (int(s[-1]) - 1, n - 1)
        s, e = s[:-1], e[:-1]

    # Middle runs -> regions (good anchor on both sides); long dropouts
    # split into ramp-down / mute / ramp-up with muted pivots.
    ga = s - 1            # good_end
    gb = e + 1            # good_after
    leftover = gb - ga - 1
    is_long = leftover > (max_ramp_down + max_ramp_up)
    if is_long.any():
        la, lb = ga[is_long], gb[is_long]
        rd_stop = la + max_ramp_down + 1
        ru_start = lb - max_ramp_up - 1
        values[rd_stop] = 0
        valid[rd_stop] = True
        values[ru_start] = 0
        valid[ru_start] = True
        mid_ok = ru_start > rd_stop
        a = np.concatenate([ga[~is_long], la, rd_stop[mid_ok], ru_start])
        b = np.concatenate([gb[~is_long], rd_stop, ru_start[mid_ok], lb])
    else:
        a, b = ga.copy(), gb.copy()
    if tail_region is not None:
        a = np.concatenate([a, [tail_region[0]]])
        b = np.concatenate([b, [tail_region[1]]])

    # Small regions (interior < 1): just revalidate.
    small = b - a < 2
    for aa, bb in zip(a[small], b[small]):
        valid[aa:bb + 1] = True
    a, b = a[~small], b[~small]
    if len(a) == 0:
        return stats
    stats.regions += len(a)

    lens = (b - a - 1).astype(np.int64)        # interior lengths
    total = int(lens.sum())
    rid = np.repeat(np.arange(len(a)), lens)
    within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    idx = a[rid] + 1 + within                   # interior sample indices
    cur = values[idx].astype(np.int64)
    if mask_mode in (DROP_MUTE_BLOCK, DROP_MUTE_WORD):
        new = np.zeros(total, dtype=np.int64)
    elif mask_mode in (DROP_HOLD_BLOCK, DROP_HOLD_WORD):
        new = values[a].astype(np.int64)[rid]
    else:  # linear interpolation in x16 fixed point (:635-737)
        lvl_a = values[a].astype(np.int64)
        lvl_b = values[b].astype(np.int64)
        cnt = b - a
        mult_begin = lvl_a * CALC_MULT
        delta = lvl_b * CALC_MULT - mult_begin
        step = np.where(delta >= 0, (delta + cnt // 2) // cnt,
                        -((-delta + cnt // 2) // cnt))
        k = within + 1
        lv = step[rid] * k + mult_begin[rid]
        new = np.where(lv >= 0, (lv + CALC_MULT // 2) // CALC_MULT,
                       -((-lv + CALC_MULT // 2) // CALC_MULT))
        # exact-equal anchors hold the level exactly (serial fast path)
        eq = (lvl_a == lvl_b)[rid]
        new = np.where(eq, lvl_a[rid], new)
    stats.masked_samples += int(np.sum(cur != new))
    values[idx] = new
    # revalidate whole regions via coverage cumsum
    ev = np.zeros(n + 1, np.int64)
    np.add.at(ev, a, 1)
    np.add.at(ev, b + 1, -1)
    valid[np.cumsum(ev[:-1]) > 0] = True
    return stats


def _mask_channel_serial(values: np.ndarray, valid: np.ndarray,
                         mask_mode: int, max_ramp_down=MAX_RAMP_DOWN,
                         max_ramp_up=MAX_RAMP_UP, file_end=True):
    """Reference per-region implementation (kept for equivalence tests)."""
    stats = MaskStats()
    n = len(values)
    if n == 0 or mask_mode == DROP_IGNORE:
        valid[:] = True
        return stats

    regions = []  # (start_good_idx, stop_good_idx) enclosing invalid run

    def sample_mute(idx):
        values[idx] = 0
        valid[idx] = True

    for s, e in zip(*_runs(~valid)):
        if s == 0:
            # Leading invalid run: no valid anchor before; mute it
            # (the reference keeps MIN_VALID_BEFORE valid points at the
            # head of any buffer, so a file can't open on a dropout).
            values[s:e + 1] = 0
            valid[s:e + 1] = True
            stats.masked_samples += e - s + 1
            continue
        good_end = s - 1
        if e == n - 1:
            # Trailing run at EOF: ramp down to zero (:1115-1160).
            if file_end:
                sample_mute(n - 1)
                regions.append((good_end, n - 1))
            continue
        good_after = e + 1
        leftover = good_after - good_end - 1
        start_masked = (values[good_end] == 0) and not valid[good_end]
        if leftover > (max_ramp_down + max_ramp_up):
            # Long dropout: ramp-down + mute + ramp-up (:920-1050).
            rd_stop = good_end + max_ramp_down + 1
            ru_start = good_after - max_ramp_up - 1
            sample_mute(rd_stop)
            sample_mute(ru_start)
            regions.append((good_end, rd_stop))
            if ru_start > rd_stop:
                regions.append((rd_stop, ru_start))
            regions.append((ru_start, good_after))
        else:
            regions.append((good_end, good_after))

    for a, b in regions:
        if b - a < 2:
            valid[a:b + 1] = True
            continue
        interior = slice(a + 1, b)
        if mask_mode in (DROP_MUTE_BLOCK, DROP_MUTE_WORD):
            stats.masked_samples += int(np.sum(values[interior] != 0))
            values[interior] = 0
        elif mask_mode in (DROP_HOLD_BLOCK, DROP_HOLD_WORD):
            hold = values[a]
            stats.masked_samples += int(np.sum(values[interior] != hold))
            values[interior] = hold
        else:  # linear interpolation in x16 fixed point (:635-737)
            lvl_begin = int(values[a])
            lvl_end = int(values[b])
            cnt = b - a - 1 + 1
            if lvl_begin == lvl_end:
                interp = np.full(b - a - 1, lvl_begin, dtype=np.int64)
            else:
                mult_begin = lvl_begin * CALC_MULT
                delta = lvl_end * CALC_MULT - mult_begin
                step = (delta + (cnt // 2 if delta >= 0 else -(cnt // 2))) \
                    // cnt if delta >= 0 else -((-delta + cnt // 2) // cnt)
                k = np.arange(1, b - a, dtype=np.int64)
                lv = step * k + mult_begin
                interp = np.where(
                    lv >= 0, (lv + CALC_MULT // 2) // CALC_MULT,
                    -((-lv + CALC_MULT // 2) // CALC_MULT))
            stats.masked_samples += int(np.sum(values[interior] != interp))
            values[interior] = interp
        valid[a:b + 1] = True
        stats.regions += 1
    return stats


class AudioProcessor:
    """Batch audio finishing: flags -> masking -> interleaved int16.

    Drain-boundary continuity: a dropout is NEVER split by the drain
    size.  The reference's 512-pair sliding buffer keeps a dropout whole
    by construction (audioprocessor.h:69, fixBadSamples :740); here each
    `process()` call withholds the trailing UNCERTAIN suffix — any
    sample whose classification or masking could still change with more
    input (a trailing invalid run, a short valid island that a future
    long dropout could stray-invalidate, plus their left anchor) — and
    prepends it to the next call.  Output bytes are therefore invariant
    to the drain/batch size (tests/test_audio_carry.py); the emitted
    length per call differs from the input length accordingly.
    """

    def __init__(self, mask_mode=DROP_INTER_LIN_WORD, remove_stray=True,
                 max_ramp_down=MAX_RAMP_DOWN, max_ramp_up=MAX_RAMP_UP):
        self.mask_mode = mask_mode
        self.remove_stray = remove_stray
        self.max_ramp_down = max_ramp_down
        self.max_ramp_up = max_ramp_up
        self.total_masked = 0
        # (samples int16 [K,2], merged valid [K,2]) withheld from the
        # previous drain; block-validity merge already applied.
        self._carry = None

    @staticmethod
    def _uncertain_start(valid: np.ndarray) -> int:
        """First index of the trailing suffix whose masking could still
        change with more input: walk runs backward past invalid runs and
        short valid islands (stray-invalidation candidates,
        fixStraySamples window MAX_STRAY_LEN+4) until a valid run long
        enough to be immune; conservative (never too small)."""
        safe_len = MAX_STRAY_LEN + 4
        starts, stops = _runs(valid)
        long_enough = np.nonzero(stops - starts + 1 >= safe_len)[0]
        if len(long_enough) == 0:
            return 0
        return int(stops[long_enough[-1]]) + 1

    def carry_state(self):
        """Withheld-suffix state for checkpoint/resume."""
        if self._carry is None:
            return None
        return (self._carry[0].copy(), self._carry[1].copy())

    def set_carry_state(self, state):
        self._carry = None if state is None else \
            (np.asarray(state[0], np.int16), np.asarray(state[1], bool))

    def flush(self):
        """EOF drain of the withheld carry (when the final chunk_to
        arrays round delivered nothing new)."""
        return self.process(np.zeros((0, 2), np.int16),
                            np.zeros((0, 2), bool), file_end=True)

    def process(self, samples: np.ndarray, word_valid: np.ndarray,
                block_ok: np.ndarray | None = None, file_end=True):
        """samples [N,2] int16, word_valid [N,2] bool, block_ok [N,2] bool.

        Returns the masked stereo int16 rows READY for output — with
        file_end=False that is the certain prefix of (carry + input);
        the uncertain tail is withheld until the next call (or EOF).
        *_BLOCK modes force sample validity from the block flag
        (fillUntilBufferFull audioprocessor.cpp:166).
        """
        valid = word_valid.copy()
        if self.mask_mode in (DROP_MUTE_BLOCK, DROP_HOLD_BLOCK,
                              DROP_INTER_LIN_BLOCK) and block_ok is not None:
            valid = valid & block_ok
        samples = np.asarray(samples, np.int16)
        if self._carry is not None:
            samples = np.concatenate([self._carry[0], samples])
            valid = np.concatenate([self._carry[1], valid])
            self._carry = None
        out = samples.astype(np.int64)
        n, n_ch = out.shape
        bounds = np.full(n_ch, n, np.int64)
        vs = []
        for ch in range(n_ch):
            v = valid[:, ch]
            if self.mask_mode != DROP_IGNORE and self.remove_stray:
                v = invalidate_stray_samples(v)
            vs.append(v)
            if not file_end:
                bounds[ch] = self._uncertain_start(v)
        for ch in range(n_ch):
            u = int(bounds[ch])
            st = mask_channel(out[:u, ch], vs[ch][:u], self.mask_mode,
                              self.max_ramp_down, self.max_ramp_up,
                              file_end=file_end)
            self.total_masked += st.masked_samples
        emitted = np.clip(out, -32768, 32767).astype(np.int16)
        if file_end:
            return emitted
        # Withhold [cut, n): everything any channel is unsure about,
        # plus one emitted anchor row so the next buffer never opens on
        # an invalid run (leading runs mute, :1115 — wrong mid-dropout).
        cut = max(int(bounds.min()) - 1, 0)
        keep_valid = np.stack(
            [vs[ch] for ch in range(n_ch)], axis=1)
        self._carry = (emitted[cut:].copy(), keep_valid[cut:].copy())
        return emitted[:cut]
