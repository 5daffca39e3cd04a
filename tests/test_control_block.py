"""Control Block wiring: detection in from_decoded, time-code/emphasis
propagation into FrameAsm and SampleChunks, M2 auto-detect.

Reference chain: binarizer.cpp:1609-1614 (detect + setServCtrlBlk),
stc007line.cpp:101-129 (line transform), stc007datastitcher.cpp:357-369
(time-code into FrameAsm), stc007line.cpp:565-579 (emphasis bit).
"""
import numpy as np

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
from sdvpcmdecoder_tpu.synth import encoder as enc


def test_control_block_roundtrip():
    words, crc = enc.control_block_line(index=5, hour=2, minute=34,
                                        second=56, field=7, emphasis=True,
                                        m2=False)
    assert bool(stc007.is_control_block(words, xp=np))
    f = stc007.control_block_fields(words)
    assert (f["index"], f["hour"], f["minute"], f["second"], f["field"]) \
        == (5, 2, 34, 56, 7)
    assert f["emphasis"] is True
    assert f["m2"] is False
    w2, _ = enc.control_block_line(m2=True, emphasis=False)
    f2 = stc007.control_block_fields(w2)
    assert f2["m2"] is True and f2["emphasis"] is False


def test_from_decoded_tags_control_block():
    words, crc = enc.control_block_line(hour=1, minute=2, second=3)
    w = np.tile(words[None, :], (3, 1))
    w[1] = np.arange(8) + 100  # ordinary data line
    crcs = np.array([crc, int(stc007.calc_crc(w[1:2], xp=np)[0]), crc])
    valid = np.array([True, True, False])  # invalid line 2: no CB tag
    store = st.LineStore.from_decoded(w, crcs, valid, np.ones(3),
                                      np.arange(1, 4))
    assert store.service[0] == st.SRV_CTRL_BLOCK
    assert store.service[1] == st.SRV_NO
    assert store.service[2] == st.SRV_NO  # CB pattern but CRC invalid
    # setServCtrlBlk transform: cue words zeroed, CRC made valid.
    assert (store.words[0, :4] == 0).all()
    assert store.source_crc[0] == stc007.calc_crc(store.words[:1],
                                                  xp=np)[0]


def _capture_with_cb(n_frames=4, lpf=294, emphasis=True, m2=False):
    rng = np.random.default_rng(11)
    n = 3 * n_frames * 2 * lpf
    frames = enc.encode_fields(rng.integers(1, 1 << 14, n),
                               rng.integers(1, 1 << 14, n), n_frames,
                               lines_pf=lpf)
    cbw, cbc = enc.control_block_line(index=1, hour=12, minute=34,
                                      second=56, field=2,
                                      emphasis=emphasis, m2=m2)
    stores = []
    for fr in frames:
        lw = np.concatenate([cbw[None, :], fr["line_words"]])
        crcs = np.concatenate([[cbc], fr["crcs"]])
        nums = np.concatenate([[fr["line_numbers"][0]],
                               fr["line_numbers"]])
        stores.append(st.LineStore.from_decoded(
            lw, crcs, np.ones(len(crcs), bool),
            np.full(len(crcs), fr["frame_number"]), nums))
    return stores


def test_stitcher_propagates_timecode_and_emphasis():
    stitcher = st.STC007Stitcher(preset_video=st.VID_PAL)
    chunks = []
    for s in _capture_with_cb(emphasis=True):
        stitcher.push_frame(s)
        chunks.extend(stitcher.pop_sample_chunks())
    stitcher.finish()
    chunks.extend(stitcher.pop_sample_chunks())
    fr = stitcher.frame_log[1]
    assert (fr.ctrl_hour, fr.ctrl_minute, fr.ctrl_second) == (12, 34, 56)
    assert fr.ctrl_index == 1 and fr.ctrl_field == 2
    assert fr.ctrl_seen and fr.ctrl_emphasis
    data = [c for c in chunks if c.service == st.SRV_NO
            and len(c.block_ok)]
    assert data and all(c.emphasis for c in data[1:])


def test_auto_m2_switch():
    stitcher = st.STC007Stitcher(preset_video=st.VID_PAL, auto_m2=True)
    assert not stitcher.mode_m2
    for s in _capture_with_cb(m2=True):
        stitcher.push_frame(s)
        stitcher.pop_sample_chunks()
    assert stitcher.mode_m2
    # without auto_m2 the mode must stay put
    stitcher = st.STC007Stitcher(preset_video=st.VID_PAL)
    for s in _capture_with_cb(m2=True):
        stitcher.push_frame(s)
        stitcher.pop_sample_chunks()
    assert not stitcher.mode_m2
