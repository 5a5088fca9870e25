"""IO layer tests: sampling semantics, native decoder vs cv2, greyscale."""
import os

import numpy as np
import pytest

from relaxtpu.data.greyscale import is_greyscale_image, video_is_greyscale
from relaxtpu.io.video import (
    frame_interval_for,
    residual_pair_indices,
    sample_indices,
)


def test_frame_interval_rule():
    # ref main_fragment_layerstack.py:273-277
    assert frame_interval_for(24) == 12
    assert frame_interval_for(29.97002997) == 14
    assert frame_interval_for(25) == 12
    assert frame_interval_for(1.5) == 1  # ceil(0.75)
    assert frame_interval_for(0.9) == 1


def test_sample_indices_match_ffmpeg_select():
    # select='not(mod(n,12))' on 30 frames -> 0,12,24
    assert sample_indices(30, 12) == [0, 12, 24]
    # successor select='not(mod(n-1,12))' -> 1,13,25; zip keeps all 3 pairs
    assert residual_pair_indices(30, 12) == [(0, 1), (12, 13), (24, 25)]
    # last sampled frame with no successor is dropped
    assert residual_pair_indices(25, 12) == [(0, 1), (12, 13)]


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    w, h = 128, 96
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (w, h))
    for i in range(48):
        frame = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        frame[:, : 4 * (i + 1) % w] = (i * 5) % 255  # frame-varying content
        vw.write(frame)
    vw.release()
    return path


def test_native_decoder_matches_cv2(clip):
    cv2 = pytest.importorskip("cv2")
    from relaxtpu.io import native

    if not native.available():
        pytest.skip("native decoder not built")
    with native.NativeDecoder(clip) as dec:
        assert dec.width == 128 and dec.height == 96
        got = dec.decode_selected([0, 12, 24])
    cap = cv2.VideoCapture(clip)
    want = []
    n = 0
    while n <= 24:
        ok, f = cap.read()
        if not ok:
            break
        if n in (0, 12, 24):
            want.append(f)
        n += 1
    cap.release()
    want = np.stack(want)
    assert got.shape == want.shape
    # both decode via libav; chroma upsampling may differ by a hair
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 2.0


def test_decode_sampled_frames_and_pairs(clip):
    from relaxtpu.io.video import decode_frame_pairs, decode_sampled_frames

    frames = decode_sampled_frames(clip)
    prev, nxt = decode_frame_pairs(clip)
    # 48 frames @24fps -> interval 12 -> samples 0,12,24,36; pairs all 4
    assert frames.shape[0] == 4
    assert prev.shape[0] == 4 and nxt.shape[0] == 4
    assert not np.array_equal(prev[0], nxt[0])


def test_nan_framerate_falls_back_to_probe(clip):
    """pandas metadata rows carry NaN (not None) for absent framerate; every
    decode entry point must treat it as 'probe the container' rather than
    computing int(nan/2)."""
    from relaxtpu.io.video import (
        decode_frame_pairs,
        decode_sampled_frames,
        decode_video_inputs,
        decode_video_inputs_i420,
    )

    nan = float("nan")
    assert decode_sampled_frames(clip, framerate=nan).shape[0] == 4
    frames, prev, nxt = decode_video_inputs(clip, framerate=nan)
    assert frames.shape[0] == 4 and nxt.shape[0] == 4
    prev2, nxt2 = decode_frame_pairs(clip, framerate=nan)
    assert prev2.shape[0] == 4
    try:
        fbuf, nbuf, h, w = decode_video_inputs_i420(clip, framerate=nan)
        assert len(fbuf) == 4 and len(nbuf) == 4
    except RuntimeError:
        pass  # native decoder not built in this checkout


def test_probe_video_metadata_fields(clip):
    from relaxtpu.io.video import probe_video

    info = probe_video(clip)
    assert info["width"] == 128 and info["height"] == 96
    assert abs(info["framerate"] - 24.0) < 0.01
    assert info["nb_frames"] == 48
    assert info["pixfmt"] == "yuv420p"
    assert info["bitdepth"] == 8
    assert info["bitrate"] is None or info["bitrate"] > 0


def test_yuv_native_matches_numpy_reader(tmp_path, rng):
    """Raw .yuv route: native rawvideo demuxer vs the numpy+cv2 reader."""
    cv2 = pytest.importorskip("cv2")
    from relaxtpu.io import native
    from relaxtpu.io.video import _read_yuv420_frames

    if not native.available():
        pytest.skip("native decoder not built")
    w, h, n = 64, 48, 6
    # FLAT chroma per frame: sws_scale upsamples 4:2:0 chroma bilinearly
    # (center-sited) while cv2 replicates, diverging by up to ~20 on varying
    # chroma; constant U/V makes the upsampling method irrelevant while random
    # luma still catches any plane-layout / frame-selection bug.
    luma = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    u = np.full((n, h // 4, w), 0, np.uint8)
    v = np.full((n, h // 4, w), 0, np.uint8)
    for i in range(n):
        u[i] = 90 + 15 * i
        v[i] = 180 - 15 * i
    raw = np.concatenate([luma, u, v], axis=1).astype(np.uint8)
    path = str(tmp_path / "clip.yuv")
    raw.tofile(path)
    with native.NativeDecoder(path, raw={"width": w, "height": h}) as dec:
        assert dec.width == w and dec.height == h
        got = dec.decode_selected([0, 2, 4])
    from relaxtpu.io.video import _yuv420_to_bgr_limited

    want = np.stack([_yuv420_to_bgr_limited(raw[i], w, h) for i in (0, 2, 4)])
    assert got.shape == want.shape
    # both are BT.601 limited-range (ffmpeg semantics); rounding differs only
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 3


def test_metadata_from_info_mat(tmp_path, rng):
    """CVD2014/LIVE-Qualcomm info-mat flow (ref extract_metadata_NR.py:111-155)."""
    import scipy.io

    from relaxtpu.io.metadata import metadata_from_info_mat

    # LIVE-Qualcomm style: raw yuv videos named in the mat
    w, h = 1920, 1080
    names = np.empty((2, 1), dtype=object)
    names[0, 0] = np.array(["vid_a.yuv"])
    names[1, 0] = np.array(["vid_b.yuv"])
    scores = np.array([[55.5], [72.25]])
    mat = str(tmp_path / "info.mat")
    scipy.io.savemat(mat, {"video_names": names, "scores": scores})
    for base in ("vid_a", "vid_b"):
        np.zeros((3, h * 3 // 2, w), np.uint8).tofile(str(tmp_path / f"{base}.yuv"))
    df = metadata_from_info_mat(mat, str(tmp_path), "live_qualcomm", framerate_hint=30.0)
    assert list(df["vid"]) == ["vid_a", "vid_b"]
    assert list(df["mos"]) == [55.5, 72.25]
    assert (df["width"] == 1920).all() and (df["height"] == 1080).all()
    assert (df["nb_frames"] == 3).all()
    assert (df["pixfmt"] == "yuv420p").all()


def test_greyscale_detector(rng):
    grey = np.repeat(rng.integers(0, 256, (20, 20, 1), dtype=np.uint8), 3, axis=2)
    color = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    assert is_greyscale_image(grey)
    assert not is_greyscale_image(color)
    assert video_is_greyscale(np.stack([grey, grey]))
    assert not video_is_greyscale(np.stack([grey, color]))


def test_native_yuv_decode_close_to_bgr_decode(tmp_path, rng):
    """decode_selected_yuv + device conversion ~= sws BGR decode (<=3 LSB).

    The two paths differ only in who runs the BT.601 conversion (sws's
    fixed-point with its own chroma filter vs our closed-form float bilinear);
    content must agree to within a couple of LSB everywhere.
    """
    cv2 = pytest.importorskip("cv2")
    import jax.numpy as jnp

    from relaxtpu.io import native
    from relaxtpu.ops.colorspace import yuv420_to_bgr

    if not native.available():
        pytest.skip("native decoder not built")
    path = str(tmp_path / "clip.mp4")
    w, h, n = 128, 96, 12
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (w, h))
    base = cv2.GaussianBlur(
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8).astype(np.float32), (0, 0), 3
    )
    for i in range(n):
        vw.write(np.clip(base + rng.normal(0, 6, base.shape), 0, 255).astype(np.uint8))
    vw.release()

    idx = [0, 3, 7]
    with native.NativeDecoder(path) as dec:
        bgr = dec.decode_selected(idx)
    with native.NativeDecoder(path) as dec:
        buf = dec.decode_selected_i420(idx)
    from relaxtpu.ops.colorspace import unpack_i420

    y, u, v = unpack_i420(jnp.asarray(buf), h, w)
    ours = np.asarray(yuv420_to_bgr(y, u, v))
    assert ours.shape == bgr.shape
    d = np.abs(ours.astype(int) - bgr.astype(int))
    # residual vs sws: its fixed-point tables + ordered dither sit +-1 almost
    # everywhere; anything beyond a few LSB would mean a real formula mismatch
    assert d.max() <= 3, d.max()
    assert d.mean() < 1.5, d.mean()
    assert (d > 2).mean() < 0.02


def test_native_decoder_garbage_file(tmp_path):
    """Garbage bytes -> clean FileNotFoundError, not a crash/hang."""
    from relaxtpu.io import native

    if not native.available():
        pytest.skip("native decoder not built")
    p = tmp_path / "garbage.mp4"
    p.write_bytes(b"\x00\x01\x02 not a video " * 1000)
    with pytest.raises(FileNotFoundError):
        native.NativeDecoder(str(p))


def test_native_decoder_truncated_stream(tmp_path, rng):
    """Truncated container: decoder returns the frames it could decode."""
    cv2 = pytest.importorskip("cv2")
    from relaxtpu.io import native

    if not native.available():
        pytest.skip("native decoder not built")
    p = str(tmp_path / "clip.mp4")
    w, h = 128, 96
    vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 24, (w, h))
    for i in range(24):
        vw.write(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    vw.release()
    data = open(p, "rb").read()
    # mp4 from cv2 keeps the moov atom at the end; cut mdat mid-way instead
    cut = str(tmp_path / "cut.mp4")
    open(cut, "wb").write(data[: int(len(data) * 0.6)])
    try:
        with native.NativeDecoder(cut) as dec:
            frames = dec.decode_selected(list(range(0, 24, 4)))
            assert len(frames) <= 6  # decoded what it could, no crash
    except FileNotFoundError:
        pass  # unparseable truncation is also acceptable


def test_decode_video_inputs_missing_file():
    from relaxtpu.io.video import decode_video_inputs

    with pytest.raises(FileNotFoundError):
        decode_video_inputs("/nonexistent/path/video.mp4")
