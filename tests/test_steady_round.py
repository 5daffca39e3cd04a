"""Steady-round fast path (stc007_steady_round) == per-pair == machine.

push_frames() routes 3+ pending frames through one native round call;
its outputs (chunks, frame logs, stats, countdown) must be identical to
both the per-pair fast path and the full stage machine, including when
the run bails mid-round and recovers.
"""
import dataclasses

import numpy as np
import pytest

from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
from sdvpcmdecoder_tpu.synth import encoder as enc

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")


def _stores(frames, corrupt, seed, knockout=None):
    rng = np.random.default_rng(seed)
    out = []
    for k, fr in enumerate(frames):
        v = np.ones(len(fr["crcs"]), bool)
        if corrupt:
            v[rng.integers(0, len(v), corrupt)] = False
        if knockout is not None and k == knockout:
            v[rng.integers(0, len(v), 300)] = False
        out.append(st.LineStore.from_decoded(
            fr["line_words"], fr["crcs"], v,
            np.full(len(fr["crcs"]), fr["frame_number"]),
            fr["line_numbers"]))
    return out


def _run(frames, mode, corrupt=0, seed=0, knockout=None, batch=None,
         **kw):
    s = st.STC007Stitcher(**kw)
    if mode == "slow":
        s._try_steady_pair = lambda: False
        s._try_steady_run = lambda: False
    elif mode == "pair":
        s._try_steady_run = lambda: False
    hits = [0]
    if mode == "round":
        orig = st.STC007Stitcher._try_steady_run

        def spy(_s=s):
            r = orig(_s)
            if r:
                hits[0] += 1
            return r
        s._try_steady_run = spy
    stores = _stores(frames, corrupt, seed, knockout)
    out = []
    if batch is None:
        s.push_frames(stores)
    else:
        for i in range(0, len(stores), batch):
            s.push_frames(stores[i:i + batch])
            out.extend(s.pop_sample_chunks())
    s.finish()
    out.extend(s.pop_sample_chunks())
    arr = st.chunks_to_arrays(out)
    log = [dataclasses.asdict(f) for f in s.frame_log]
    return (arr, log, s.broken_countdown, s.stats_field_order,
            s.stats_resolution, hits[0])


def _assert_equal(a, b, tag):
    assert (a[0] is None) == (b[0] is None)
    if a[0] is not None:
        for x, y in zip(a[0][:3], b[0][:3]):
            np.testing.assert_array_equal(x, y, err_msg=tag)
        assert a[0][3] == b[0][3]
    assert len(a[1]) == len(b[1]), tag
    for i, (f1, f2) in enumerate(zip(a[1], b[1])):
        assert f1 == f2, (tag, i,
                          {k: (f1[k], f2[k]) for k in f1 if f1[k] != f2[k]})
    assert a[2:5] == b[2:5], tag


def _capture(n_frames=12, lpf=294, resolution=14, seed=1):
    rng = np.random.default_rng(seed)
    n = 3 * n_frames * 2 * lpf
    return enc.encode_fields(rng.integers(1, 1 << 14, n),
                             rng.integers(1, 1 << 14, n), n_frames,
                             lines_pf=lpf, resolution=resolution)


@pytest.mark.parametrize("corrupt,seed", [(0, 0), (40, 7), (120, 3)])
def test_round_matches_pair_and_slow(corrupt, seed):
    frames = _capture(seed=seed + 1)
    r = _run(frames, "round", corrupt=corrupt, seed=seed)
    p = _run(frames, "pair", corrupt=corrupt, seed=seed)
    s = _run(frames, "slow", corrupt=corrupt, seed=seed)
    _assert_equal(r, p, f"round-vs-pair c={corrupt}")
    _assert_equal(r, s, f"round-vs-slow c={corrupt}")
    if corrupt == 0:
        assert r[5] >= 1  # the round actually engaged


def test_round_in_driver_batches():
    """push_frames in 4-frame batches (the batch-driver shape) equals
    the per-frame machine."""
    frames = _capture(n_frames=16, seed=9)
    r = _run(frames, "round", corrupt=25, seed=2, batch=4)
    s = _run(frames, "slow", corrupt=25, seed=2, batch=4)
    _assert_equal(r, s, "batched")


def test_round_bails_and_recovers_mid_stream():
    """A half-dead frame mid-round forces a bail to the machine; the
    run must resume after it with identical output."""
    frames = _capture(n_frames=14, seed=4)
    r = _run(frames, "round", corrupt=10, seed=5, knockout=7)
    s = _run(frames, "slow", corrupt=10, seed=5, knockout=7)
    _assert_equal(r, s, "knockout")


def test_round_16bit_and_ntsc():
    for kw in (dict(resolution=16), dict(lpf=245)):
        frames = _capture(n_frames=10, seed=6, **kw)
        r = _run(frames, "round", corrupt=15, seed=8)
        s = _run(frames, "slow", corrupt=15, seed=8)
        _assert_equal(r, s, str(kw))


def test_round_cwd_engages_and_matches():
    """en_cwd used to exclude the round path; the C-side performCWD
    write-back fixpoint (stc007_cwd_fixpoint) now carries it — the
    round must ENGAGE and stay bit-identical to the machine
    (tests/test_steady_cwd.py covers the write-back semantics)."""
    frames = _capture(n_frames=6, seed=10)
    for kw in (dict(en_cwd=True),):
        r = _run(frames, "round", **kw)
        assert r[5] >= 1, kw
        s = _run(frames, "slow", **kw)
        _assert_equal(r, s, str(kw))


def test_round_resolution_presets_engage():
    """--resolution 14bit/16bit fixes every mode: the round engages and
    matches the machine (incl. the preset's resolution-stats updates)."""
    for res, preset in ((14, st.SAMPLE_RES_14BIT),
                        (16, st.SAMPLE_RES_16BIT)):
        frames = _capture(n_frames=8, seed=13, resolution=res)
        kw = dict(preset_resolution=preset)
        r = _run(frames, "round", corrupt=15, seed=2, **kw)
        p = _run(frames, "pair", corrupt=15, seed=2, **kw)
        s = _run(frames, "slow", corrupt=15, seed=2, **kw)
        _assert_equal(r, p, f"preset {res} round-vs-pair")
        _assert_equal(r, s, f"preset {res} round-vs-slow")
        assert r[5] >= 1, f"preset {res} engaged"


def test_round_m2_engages_and_matches():
    """M2 rides the steady round (fixed 14-bit modes, no fresh-field
    resolution counting) — chunks/logs/stats identical to the machine."""
    for corrupt in (0, 40):
        frames = _capture(n_frames=8, seed=11)
        r = _run(frames, "round", corrupt=corrupt, seed=3, mode_m2=True)
        p = _run(frames, "pair", corrupt=corrupt, seed=3, mode_m2=True)
        s = _run(frames, "slow", corrupt=corrupt, seed=3, mode_m2=True)
        _assert_equal(r, p, f"m2 round-vs-pair c={corrupt}")
        _assert_equal(r, s, f"m2 round-vs-slow c={corrupt}")
        if corrupt == 0:
            assert r[5] >= 1, "m2 round engaged"


def test_round_with_control_blocks():
    """Control Block service lines ride through the steady round (their
    time-code/emphasis fields reach the frasm log and the chunks) —
    from_decoded tags them as service, so the round must still engage."""
    frames = _capture(n_frames=10, seed=12)
    cbw, cbc = enc.control_block_line(index=1, hour=12, minute=34,
                                      second=56, field=2, emphasis=True)

    def stores():
        out = []
        for fr in frames:
            lw = np.concatenate([cbw[None, :], fr["line_words"]])
            crcs = np.concatenate([[cbc], fr["crcs"]])
            nums = np.concatenate([[fr["line_numbers"][0]],
                                   fr["line_numbers"]])
            out.append(st.LineStore.from_decoded(
                lw, crcs, np.ones(len(crcs), bool),
                np.full(len(crcs), fr["frame_number"]), nums))
        return out

    def run(disable):
        s = st.STC007Stitcher()
        hits = [0]
        if disable:
            s._try_steady_pair = lambda: False
            s._try_steady_run = lambda: False
        else:
            orig = st.STC007Stitcher._try_steady_run

            def spy(_s=s):
                r = orig(_s)
                if r:
                    hits[0] += 1
                return r
            s._try_steady_run = spy
        s.push_frames(stores())
        s.finish()
        arr = st.chunks_to_arrays(s.pop_sample_chunks())
        log = [dataclasses.asdict(f) for f in s.frame_log]
        return arr, log, hits[0]

    a, la, hits = run(False)
    b, lb, _ = run(True)
    for x, y in zip(a[:3], b[:3]):
        np.testing.assert_array_equal(x, y)
    assert la == lb
    assert hits >= 1, "round must engage with CB lines present"
    assert any(f["ctrl_seen"] and f["ctrl_emphasis"] for f in la)


def test_round_with_dropped_frame_dummies():
    """All-invalid dummy frames (the driver's dropped-frame insert)
    interrupt the steady run; output must match the machine exactly."""
    frames = _capture(n_frames=10, seed=20)

    def run(disable):
        s = st.STC007Stitcher()
        if disable:
            s._try_steady_pair = lambda: False
            s._try_steady_run = lambda: False
        stores = _stores(frames, 0, 0)
        # replace frame 5 with a dummy (LineStore of invalid lines)
        dummy = st.LineStore(len(frames[5]["crcs"]))
        dummy.frame_number[:] = frames[5]["frame_number"]
        dummy.line_number = np.asarray(frames[5]["line_numbers"],
                                       np.int64).copy()
        stores[5] = dummy
        s.push_frames(stores)
        s.finish()
        arr = st.chunks_to_arrays(s.pop_sample_chunks())
        log = [dataclasses.asdict(f) for f in s.frame_log]
        return arr, log

    a, la = run(False)
    b, lb = run(True)
    for x, y in zip(a[:3], b[:3]):
        np.testing.assert_array_equal(x, y)
    assert la == lb


def test_round_config_fuzz():
    """Deterministic mini-fuzz over random (frames, lpf, resolution,
    corruption, knockout, batching) configurations — round == machine."""
    rng = np.random.default_rng(2026)
    for trial in range(6):
        n_frames = int(rng.integers(4, 13))
        lpf = int(rng.choice([245, 294]))
        res = int(rng.choice([14, 16]))
        corrupt = int(rng.integers(0, 200))
        seed = int(rng.integers(0, 10000))
        ko = int(rng.integers(0, n_frames)) if rng.random() < 0.4 else None
        batch = int(rng.choice([0, 3, 4, 7])) or None
        frames = _capture(n_frames=n_frames, lpf=lpf, resolution=res,
                          seed=seed)
        kw = dict(corrupt=corrupt, seed=seed + 1, knockout=ko, batch=batch)
        pick = rng.random()
        if pick < 0.25:
            kw["mode_m2"] = True
        elif pick < 0.45:
            kw["preset_resolution"] = (st.SAMPLE_RES_16BIT if res == 16
                                       else st.SAMPLE_RES_14BIT)
        r = _run(frames, "round", **kw)
        s = _run(frames, "slow", **kw)
        _assert_equal(r, s, f"fuzz t{trial}")


def test_round_with_cropped_fields_and_paddings():
    """Bottom-cropped fields force nonzero inner/outer paddings: the
    steady path's conv carry then contains PAD rows whose line/frame
    numbering must match fillFrameForOutput exactly (the uncovered
    branch of _build_carry)."""
    rng = np.random.default_rng(31)
    n_frames, lpf = 12, 294
    n = 3 * n_frames * 2 * lpf
    frames = enc.encode_fields(rng.integers(1, 1 << 14, n),
                               rng.integers(1, 1 << 14, n), n_frames,
                               lines_pf=lpf, bottom_crop=8)
    r = _run(frames, "round", corrupt=0, seed=0)
    p = _run(frames, "pair", corrupt=0, seed=0)
    s = _run(frames, "slow", corrupt=0, seed=0)
    _assert_equal(r, p, "cropped round-vs-pair")
    _assert_equal(r, s, "cropped round-vs-slow")
    # the steady path must actually engage with nonzero paddings
    assert r[5] >= 1, "round engaged"
    assert any(f["inner_padding"] > 0 or f["outer_padding"] > 0
               for f in r[1]), "paddings present"


def test_round_with_preset_field_order():
    """Preset TFF/BFF rides through the steady paths (the order-preset
    replay branches)."""
    for order in (st.ORDER_TFF, st.ORDER_BFF):
        frames = _capture(n_frames=8, seed=40 + order)
        r = _run(frames, "round", corrupt=10, seed=2,
                 preset_order=order)
        s = _run(frames, "slow", corrupt=10, seed=2,
                 preset_order=order)
        _assert_equal(r, s, f"preset order {order}")


def test_round_with_one_dead_fresh_field():
    """One frame-B field fully invalid: its fresh resolution is UNKNOWN
    and the frame-B modes take detectAudioResolution's strict/auto
    mixed branch — steady must still match the machine (and defer on
    the following pair, whose frame-A resolution is unknown)."""
    frames = _capture(n_frames=10, seed=50)

    def run(disable):
        s = st.STC007Stitcher()
        if disable:
            s._try_steady_pair = lambda: False
            s._try_steady_run = lambda: False
        stores = _stores(frames, 0, 0)
        for k in (5, 6):
            # kill the EVEN field of frames 5/6 (odd line numbers = odd
            # field; even-numbered lines invalid)
            store = stores[k]
            even = (store.line_number % 2) == 0
            store.word_crc[even] = False
            store.word_valid[even] = False
            store._crcv = store._crcv & ~even
        s.push_frames(stores)
        s.finish()
        arr = st.chunks_to_arrays(s.pop_sample_chunks())
        log = [dataclasses.asdict(f) for f in s.frame_log]
        return arr, log, s.stats_resolution

    a = run(False)
    b = run(True)
    for x, y in zip(a[0][:3], b[0][:3]):
        np.testing.assert_array_equal(x, y)
    assert a[1] == b[1] and a[2] == b[2]


def test_round_ecc_toggles_match():
    """--no-ecc variants (en_p/en_q off) defer or match, never diverge."""
    for kw in (dict(en_p=False, en_q=False), dict(en_q=False),
               dict(en_p=False)):
        frames = _capture(n_frames=8, seed=60)
        r = _run(frames, "round", corrupt=30, seed=9, **kw)
        s = _run(frames, "slow", corrupt=30, seed=9, **kw)
        _assert_equal(r, s, str(kw))
