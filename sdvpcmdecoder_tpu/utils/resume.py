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

FORMAT_VERSION = 2


def save_checkpoint(path, frame_index: int, stitcher: st.STC007Stitcher,
                    samples_written: int, sample_rate: int = 44100):
    path = Path(path)
    meta = dict(
        version=FORMAT_VERSION,
        frame_index=frame_index,
        samples_written=samples_written,
        sample_rate=sample_rate,
        frasm_f0=dataclasses.asdict(stitcher.frasm_f0),
        frasm_f1=dataclasses.asdict(stitcher.frasm_f1),
        stats_field_order=stitcher.stats_field_order,
        stats_resolution=stitcher.stats_resolution,
        broken_countdown=stitcher.broken_countdown,
        pending_nos=[fno for fno, _ in stitcher.pending_frames],
    )
    path.with_suffix(".json").write_text(json.dumps(meta))
    conv = stitcher.conv_queue
    arrays = {f: getattr(conv, f) for f in st.LineStore.FIELDS}
    # The sliding window's unpaired frames must survive the restart or
    # the first resumed frame would never be seam-stitched.
    for i, (_, store) in enumerate(stitcher.pending_frames):
        for f in st.LineStore.FIELDS:
            arrays[f"pend{i}_{f}"] = getattr(store, f)
    np.savez_compressed(path.with_suffix(".npz"), **arrays)


def load_checkpoint(path, stitcher: st.STC007Stitcher):
    """Restore stitcher state; returns (frame_index, samples_written,
    sample_rate)."""
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
    stitcher.pending_frames = []
    for i, fno in enumerate(meta.get("pending_nos", [])):
        store = st.LineStore(0)
        for f in st.LineStore.FIELDS:
            setattr(store, f, data[f"pend{i}_{f}"])
        stitcher.pending_frames.append((int(fno), store))
    return (int(meta["frame_index"]), int(meta["samples_written"]),
            int(meta.get("sample_rate", 44100)))
