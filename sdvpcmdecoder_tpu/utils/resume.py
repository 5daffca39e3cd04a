"""Checkpoint/resume for long batch decodes.

The reference streams one-pass with no resume (SURVEY.md section 5); its
only mid-run durability is the WAV header patch-on-flush. Batch jobs over
hours of tape need real resume: frame index, stitcher carry state (frame
descriptors, stats histories, conv-queue tail) and the output sample
count, snapshotted as a JSON + npz pair next to the WAV.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

from ..pipeline import stitcher_stc007 as st

FORMAT_VERSION = 1


def save_checkpoint(path, frame_index: int, stitcher: st.STC007Stitcher,
                    samples_written: int):
    path = Path(path)
    meta = dict(
        version=FORMAT_VERSION,
        frame_index=frame_index,
        samples_written=samples_written,
        frasm_f0=dataclasses.asdict(stitcher.frasm_f0),
        frasm_f1=dataclasses.asdict(stitcher.frasm_f1),
        stats_field_order=stitcher.stats_field_order,
        stats_resolution=stitcher.stats_resolution,
        broken_countdown=stitcher.broken_countdown,
    )
    path.with_suffix(".json").write_text(json.dumps(meta))
    conv = stitcher.conv_queue
    np.savez_compressed(
        path.with_suffix(".npz"),
        **{f: getattr(conv, f) for f in st.LineStore.FIELDS})


def load_checkpoint(path, stitcher: st.STC007Stitcher):
    """Restore stitcher state; returns (frame_index, samples_written)."""
    path = Path(path)
    meta = json.loads(path.with_suffix(".json").read_text())
    assert meta["version"] == FORMAT_VERSION
    for name in ("frasm_f0", "frasm_f1"):
        setattr(stitcher, name, st.FrameAsm(**meta[name]))
    stitcher.frasm_f2 = st.FrameAsm()
    stitcher.stats_field_order = list(meta["stats_field_order"])
    stitcher.stats_resolution = list(meta["stats_resolution"])
    stitcher.broken_countdown = int(meta["broken_countdown"])
    data = np.load(path.with_suffix(".npz"))
    conv = st.LineStore(0)
    for f in st.LineStore.FIELDS:
        setattr(conv, f, data[f])
    stitcher.conv_queue = conv
    return int(meta["frame_index"]), int(meta["samples_written"])
