"""ASCII line dumps (dumpWordsString analog, pcmline.h DUMP_* legend)."""
import numpy as np

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.utils import dump


def test_stc007_dump_legend():
    words = [0b10000000000001] + [0] * 7
    s = dump.dump_line(words, True, fmt="stc007", crc=0xA96A)
    # marker header + valid brackets + '#'/'-' charset
    assert s.startswith("#-#-")
    assert s[4:20] == "[#------------#]"
    assert "[#-#-#--#-##-#-#-]" in s  # 0xA96A under a valid CRC
    bad = dump.dump_line(words, False, fmt="stc007", crc=0xA96A)
    assert bad.startswith("1010")
    assert "@1" + "0" * 12 + "1@" in bad  # invalid charset + '@'
    no_marker = dump.dump_line(words, True, fmt="stc007",
                               has_marker=False)
    assert no_marker.startswith("----")


def test_word_ok_brackets_independent_of_line():
    words = [1, 2]
    s = dump.dump_line(words, True, fmt="pcm16x0",
                       word_ok=[True, False, True])
    assert "[" in s and "@" in s


def test_batch_dump_rows():
    words = np.zeros((3, 8), np.int64)
    crcs = np.array([0xA96A, 1, 2])
    valid = np.array([True, False, True])
    rows = dump.dump_lines(words, crcs, valid, fmt="stc007",
                           line_numbers=[1, 3, 5], limit=2)
    assert len(rows) == 2
    assert rows[0].startswith("L[0001] ") and rows[0].endswith(" OK")
    assert rows[1].endswith(" --")


def test_cli_dump_lines(tmp_path, capsys):
    import sys as _sys
    import numpy as np
    from sdvpcmdecoder_tpu.synth import encoder as enc
    from sdvpcmdecoder_tpu.pipeline import ingest
    from sdvpcmdecoder_tpu.__main__ import main

    rng = np.random.default_rng(4)
    lpf = 294
    n = 3 * 2 * 2 * lpf
    frames = enc.encode_fields(rng.integers(1, 1 << 14, n),
                               rng.integers(1, 1 << 14, n), 2,
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
    y4m = tmp_path / "d.y4m"
    ingest.write_y4m(str(y4m), np.stack(vids))
    argv = _sys.argv
    _sys.argv = ["sdv", str(y4m), "-o", str(tmp_path / "d.wav"),
                 "--dump-lines", "2"]
    try:
        main()
    finally:
        _sys.argv = argv
    out = capsys.readouterr().out
    assert "L[0001]" in out and "#-#-[" in out


def test_cli_dump_lines_pcm1(tmp_path, capsys):
    import sys as _sys
    import numpy as np
    from sdvpcmdecoder_tpu.formats import pcm1
    from sdvpcmdecoder_tpu.ops import pcm1_deint as di1
    from sdvpcmdecoder_tpu.pipeline import ingest
    from sdvpcmdecoder_tpu.pipeline import stitcher_pcm1 as sp1
    from sdvpcmdecoder_tpu.synth import encoder as enc
    from sdvpcmdecoder_tpu.__main__ import main

    rng = np.random.default_rng(6)
    W = 1024
    vids = []
    for _ in range(2):
        img = np.zeros((2 * sp1.LINES_PF, W), np.uint8) + 20
        for half in range(2):
            sl, sr = di1.interleave_field(
                rng.integers(0, 1 << 13, di1.FIELD_SUBLINES),
                rng.integers(0, 1 << 13, di1.FIELD_SUBLINES))
            words = np.zeros((sp1.LINES_PF, 6), np.int64)
            words[:, 0::2] = np.stack([sl[0::3], sl[1::3], sl[2::3]], 1)
            words[:, 1::2] = np.stack([sr[0::3], sr[1::3], sr[2::3]], 1)
            crcs = pcm1.calc_crc(words, xp=np)
            bits = pcm1.words_to_data_bits(words, crcs, xp=np)
            px, _ = enc.render_bits(bits, width=W, ppb=10.0)
            img[half::2] = px
        vids.append(img)
    y4m = tmp_path / "p.y4m"
    ingest.write_y4m(str(y4m), np.stack(vids), chroma="mono")
    argv = _sys.argv
    _sys.argv = ["sdv", str(y4m), "-o", str(tmp_path / "p.wav"),
                 "--format", "pcm1", "--dump-lines", "2"]
    try:
        main()
    finally:
        _sys.argv = argv
    out = capsys.readouterr().out
    assert "L[0000]" in out and ("[" in out or "@" in out)
