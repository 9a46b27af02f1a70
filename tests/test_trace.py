"""PhaseTracer: time/<phase> scalars always; device traces when enabled."""
import glob
import os

import jax
import jax.numpy as jnp

from alphazero_general_tpu.utils.trace import PhaseTracer


class RecordingWriter:
    def __init__(self):
        self.scalars = []

    def add_scalar(self, tag, value, step):
        self.scalars.append((tag, float(value), int(step)))


def test_phase_times_recorded():
    w = RecordingWriter()
    tr = PhaseTracer(w)
    with tr.phase("self_play", 3):
        pass
    with tr.phase("train", 3):
        pass
    tags = [t for t, _, _ in w.scalars]
    assert tags == ["time/self_play", "time/train"]
    assert all(v >= 0 for _, v, _ in w.scalars)
    assert all(s == 3 for _, _, s in w.scalars)


def test_phase_time_survives_exception():
    w = RecordingWriter()
    tr = PhaseTracer(w)
    try:
        with tr.phase("train", 1):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert [t for t, _, _ in w.scalars] == ["time/train"]


def test_device_trace_capture(tmp_path):
    w = RecordingWriter()
    tr = PhaseTracer(w, profile_dir=str(tmp_path), max_traces=1)
    for it in (1, 2):  # second occurrence must NOT trace (max_traces=1)
        with tr.phase("self_play", it):
            jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    trace_dirs = sorted(os.path.basename(p)
                        for p in glob.glob(str(tmp_path / "*")))
    assert trace_dirs == ["self_play-iter001"]
    # a real trace payload was written (xplane protobuf under plugins/)
    assert glob.glob(str(tmp_path / "self_play-iter001/**/*.xplane.pb"),
                     recursive=True)
    assert len(w.scalars) == 2
