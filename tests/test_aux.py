"""Aux subsystems: renderer, ArVid model, mesh chunking, resume."""
import numpy as np

from sdvpcmdecoder_tpu.formats import arvid, stc007
from sdvpcmdecoder_tpu.pipeline import render, stitcher_stc007 as st
from sdvpcmdecoder_tpu.parallel import mesh
from sdvpcmdecoder_tpu.utils import resume
from sdvpcmdecoder_tpu.synth import encoder as enc


def test_render_lines_and_ppm(tmp_path):
    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 14, size=(12, 8))
    crcs = stc007.calc_crc(words, xp=np)
    valid = np.ones(12, bool)
    valid[3] = False
    img = render.render_stc007_lines(words, crcs, valid,
                                     fixed_p=np.arange(12) == 5)
    assert img.shape == (12, 137 * render.PPB_STC007LINE, 3)
    # Invalid line has red bit-1 cells, valid gray, P-fixed green.
    assert (img[3] == render.PAL_RED[1]).all(axis=-1).any()
    assert (img[0] == render.PAL_GRAY[1]).all(axis=-1).any()
    assert (img[5] == render.PAL_GREEN[1]).all(axis=-1).any()
    p = tmp_path / "x.ppm"
    render.write_ppm(p, img)
    back = render.read_ppm(p)
    np.testing.assert_array_equal(back, img)


def test_arvid_bits_roundtrip():
    rng = np.random.default_rng(1)
    words = rng.integers(0, 256, size=(5, arvid.WORD_CNT))
    bits = arvid.words_to_data_bits(words)
    assert bits.shape == (5, arvid.BITS_PCM_DATA)
    np.testing.assert_array_equal(arvid.data_bits_to_words(bits), words)


def test_chunk_halo():
    lines = np.arange(1000)[:, None] * np.ones((1, 4))
    chunks, chunk = mesh.chunk_lines_with_halo(lines, 4)
    assert chunks.shape[0] == 4
    assert chunks.shape[1] == chunk + mesh.HALO
    # Halo overlap: chunk k's tail == chunk k+1's head.
    np.testing.assert_array_equal(chunks[0][chunk:], chunks[1][:mesh.HALO])


def test_resume_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    lpf = 294
    n = 3 * 3 * 2 * lpf
    frames = enc.encode_fields(rng.integers(1, 1 << 14, size=n),
                               rng.integers(1, 1 << 14, size=n), 3,
                               lines_pf=lpf)
    s = st.STC007Stitcher(preset_video=st.VID_PAL)
    for fr in frames[:2]:
        nl = len(fr["crcs"])
        s.push_frame(st.LineStore.from_decoded(
            fr["line_words"], fr["crcs"], np.ones(nl, bool),
            np.full(nl, fr["frame_number"]), fr["line_numbers"]))
    n_out = len(s.pop_samples())
    ck = tmp_path / "ck"
    resume.save_checkpoint(ck, 2, s, n_out)
    s2 = st.STC007Stitcher(preset_video=st.VID_PAL)
    fidx, written, _rate = resume.load_checkpoint(ck, s2)
    assert (fidx, written) == (2, n_out)
    assert s2.frasm_f1.frame_number == s.frasm_f1.frame_number
    assert len(s2.conv_queue) == len(s.conv_queue)
    np.testing.assert_array_equal(s2.conv_queue.words, s.conv_queue.words)
    # Resumed stitcher keeps decoding the remaining frames.
    fr = frames[2]
    nl = len(fr["crcs"])
    s2.push_frame(st.LineStore.from_decoded(
        fr["line_words"], fr["crcs"], np.ones(nl, bool),
        np.full(nl, fr["frame_number"]), fr["line_numbers"]))
    s2.finish()
    assert len(s2.pop_samples()) > 0


def test_checkpoint_pending_frames(tmp_path):
    """Checkpoint v2 roundtrips the sliding window's unpaired frame."""
    from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
    from sdvpcmdecoder_tpu.utils import resume as ck
    s1 = st.STC007Stitcher(preset_video=st.VID_PAL)
    store = st.LineStore(10)
    store.frame_number[:] = 7
    store.line_number = 1 + 2 * np.arange(10)
    s1.push_frame(store)            # one frame stays pending (window of 2)
    assert len(s1.pending_frames) == 1
    ck.save_checkpoint(tmp_path / "c", 7, s1, 1234, 44100)
    s2 = st.STC007Stitcher(preset_video=st.VID_PAL)
    fi, sw, rate = ck.load_checkpoint(tmp_path / "c", s2)
    assert (fi, sw, rate) == (7, 1234, 44100)
    assert len(s2.pending_frames) == 1
    fno, pend = s2.pending_frames[0]
    assert fno == 7
    np.testing.assert_array_equal(pend.line_number, store.line_number)


def test_arvid_read_line_roundtrip():
    """ArVid binarize path (fillArVidAudio analog): rendered 18x8-bit
    words read back exactly; no CRC exists for the prototype format."""
    from sdvpcmdecoder_tpu.formats import arvid
    from sdvpcmdecoder_tpu.ops import line_decode_np as ld
    rng = np.random.default_rng(0)
    words = rng.integers(0, 256, size=(5, 18))
    bits = arvid.words_to_data_bits(words)
    px, (ds, de) = enc.render_bits(bits, width=1280, ppb=8.0,
                                   noise_sigma=6.0, rng=rng)
    for i in range(5):
        got = ld.arvid_read_line(px[i], ds, de, 110)
        np.testing.assert_array_equal(got, words[i])


def test_di_time_telemetry():
    from sdvpcmdecoder_tpu.utils.stats import DecodeStats
    s = DecodeStats()
    s.add_di_time(10_000, 2)   # 5 ms/frame
    s.add_di_time(2_000, 1)    # 2 ms/frame
    assert s.di_time_min_us == 2_000
    assert s.di_time_max_us == 5_000
    assert s.di_time_frames == 3
    assert "DI time/frame" in s.summary()


def test_render_dir_emits_all_four_views(tmp_path):
    """--render-dir produces the reference's four frame_vis windows:
    source, binarized lines, reassembled frame, data blocks
    (mainwindow.h:393-396, renderpcm.h:123-150)."""
    import numpy as np
    from sdvpcmdecoder_tpu.__main__ import main
    from sdvpcmdecoder_tpu.pipeline import ingest, render as rn
    from sdvpcmdecoder_tpu.synth import encoder as enc
    rng = np.random.default_rng(8)
    lpf = 294
    n_frames = 3
    n = 3 * n_frames * 2 * lpf
    frames = enc.encode_fields(rng.integers(1, 1 << 14, n),
                               rng.integers(1, 1 << 14, n), n_frames,
                               lines_pf=lpf)
    vids = []
    for fr in frames:
        px, _ = enc.render_lines(fr["line_words"], fr["crcs"],
                                 width=1152, ppb=8.0)
        L = px.shape[0]
        img = np.zeros((L, 1152), np.uint8)
        img[0::2] = px[:L // 2]
        img[1::2] = px[L // 2:]
        vids.append(img)
    cap = tmp_path / "c.y4m"
    ingest.write_y4m(cap, np.stack(vids))
    rdir = tmp_path / "views"
    rc = main([str(cap), "-o", str(tmp_path / "o.wav"),
               "--quality", "fast", "--render-dir", str(rdir)])
    assert rc == 0
    import os
    names = sorted(os.listdir(rdir))
    for kind in ("source_", "frame_", "assembled_", "blocks_"):
        hits = [x for x in names if x.startswith(kind)]
        assert hits, f"missing {kind} views: {names}"
        img = rn.read_ppm(rdir / hits[0])
        assert img.ndim == 3 and img.shape[2] == 3 and img.size > 0
    # Block view of a clean capture: gray/white palette only, no red.
    blocks = rn.read_ppm(rdir / [x for x in names
                                 if x.startswith("blocks_")][-1])
    red = (blocks[..., 0] > 200) & (blocks[..., 1] < 100)
    assert not red.any()


def test_imed_matches_np_median():
    """_imed is bit-identical to int(np.median(...)) on nonnegative ints
    (both odd and even lengths, including duplicate values)."""
    import numpy as np
    from sdvpcmdecoder_tpu.pipeline.v2d import _imed
    rng = np.random.default_rng(7)
    for n in range(1, 33):
        for _ in range(20):
            a = rng.integers(0, 2000, size=n)
            assert _imed(a) == int(np.median(a)), (n, a)
    # list input (ref_history is a plain list)
    assert _imed([5, 3, 9]) == 5
    assert _imed([4, 10]) == 7
