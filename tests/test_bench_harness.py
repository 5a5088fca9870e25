"""Bench harness invariants (tiny shapes, host-only).

The bench derives videos 1..N by byte-rolling ONE synthesized base video
(`bench.synthetic_videos`) because host synthesis dominates the wall-clock
budget at high resolution (~340 s per 4K video vs a 2.1 s device program).
These tests pin the invariants the measurements rely on: distinct YUV
content per variant (defeats relay/content caching), pair semantics
(prev is the sampled-frames prefix — reference select rule,
/root/reference/src/vf_extract.py), and zero BGR copies when the YUV-only
path asks for none.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import synthetic_video, synthetic_videos  # noqa: E402


def test_variants_distinct_and_shaped(rng):
    vids = synthetic_videos(rng, 3, n_frames=2, h=16, w=24)
    assert len(vids) == 3
    base = vids[0]
    for v in vids[1:]:
        for j in range(5):
            if isinstance(base[j], tuple):
                assert all(a.shape == b.shape for a, b in zip(v[j], base[j]))
            else:
                assert v[j].shape == base[j].shape
        # YUV luma content differs from the base (cache-defeating)
        assert not np.array_equal(v[3][0], base[3][0])
    # variants differ from EACH OTHER too, not just from the base
    assert not np.array_equal(vids[1][3][0], vids[2][3][0])


def test_variant_pair_semantics(rng):
    vids = synthetic_videos(rng, 2, n_frames=3, h=16, w=24)
    frames, prev, nxt, _, _ = vids[1]
    np.testing.assert_array_equal(prev, frames[:3])
    assert nxt.shape == frames.shape


def test_roll_bgr_false_shares_base_arrays(rng):
    vids = synthetic_videos(rng, 2, n_frames=2, h=16, w=24, roll_bgr=False)
    assert vids[1][0] is vids[0][0]  # frames shared, no host copy
    assert not np.array_equal(vids[1][3][0], vids[0][3][0])  # yuv still rolled


def test_yuv_only_layout(rng):
    """High-res rows synthesize I420 planes directly (no BGR chain)."""
    vids = synthetic_videos(rng, 2, n_frames=3, h=16, w=24, yuv_only=True)
    for v in vids:
        assert v[0] is None and v[1] is None and v[2] is None
        fyuv, nyuv = v[3], v[4]
        assert fyuv[0].shape == (3, 16, 24) and fyuv[0].dtype == np.uint8
        assert fyuv[1].shape == (3, 8, 12) and fyuv[2].shape == (3, 8, 12)
        assert nyuv[0].shape == (3, 16, 24)
    assert not np.array_equal(vids[1][3][0], vids[0][3][0])


def test_base_matches_synthetic_video(rng):
    """videos[0] must be a REAL synthesis (the torch/cv2 baseline uses it)."""
    a = synthetic_videos(np.random.default_rng(7), 1, n_frames=2, h=16, w=24)[0]
    b = synthetic_video(np.random.default_rng(7), 2, 16, 24)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[3][0], b[3][0])


def test_sigterm_emits_partial_artifact():
    """An outer driver timeout (SIGTERM) must flush the partial JSON line.

    The SIGALRM hard deadline sits up to BUDGET+GRACE out; a driver that
    kills earlier delivers SIGTERM, and round 4 made that path emit too.
    """
    import json as _json
    import subprocess

    code = (
        "import os, signal, sys\n"
        "sys.path.insert(0, '.')\n"
        "import bench\n"
        "bench._PARTIAL[0], bench._PARTIAL[1] = 1.5, 0.5\n"
        "bench._PARTIAL[2] = {'vps_stream': 1.5}\n"
        "bench._arm_sigterm()\n"
        "bench._arm_deadline()\n"
        "os.kill(os.getpid(), signal.SIGTERM)\n"
        "raise SystemExit('handler did not exit')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=60,
        # the child does sys.path.insert(0, '.') to import bench — pin its
        # cwd to the repo root so pytest can be invoked from anywhere
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    d = _json.loads(line)
    assert d["value"] == 1.5 and d["vs_baseline"] == 3.0
    assert "SIGTERM" in d["detail"]["deadline_hit"]


def test_sigterm_before_any_measurement_emits_placeholder():
    """SIGTERM during stream pass 1 (nothing measured yet) must still emit a
    JSON line — a placeholder naming the failure, value 0.0 — instead of
    dying silently.  Measured failure mode: a 580 s outer timeout killed a
    run mid-stream (relay link in its slow bimodal mode) with an empty log."""
    import json as _json
    import subprocess

    code = (
        "import os, signal, sys\n"
        "sys.path.insert(0, '.')\n"
        "import bench\n"
        "bench._arm_sigterm()\n"  # what main() does at entry
        "os.kill(os.getpid(), signal.SIGTERM)\n"
        "raise SystemExit('handler did not exit')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=60,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    d = _json.loads(line)
    assert d["value"] == 0.0 and d["vs_baseline"] == 0.0
    assert "placeholder" in d["detail"]["deadline_hit"]
    assert "elapsed_s" in d["detail"]
