"""Native C++ decode shim vs cv2 on generated videos."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from sasvqa_tpu.data.video_decode import (VideoDecoder, decode_video,
                                          native_available)


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "test.avi")
    w, h, n = 64, 48, 30
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                             (w, h))
    for t in range(n):
        frame = np.zeros((h, w, 3), np.uint8)
        frame[:, :, 0] = int(255 * t / n)   # blue ramp (BGR)
        frame[:, :, 2] = 255 - int(255 * t / n)
        writer.write(frame)
    writer.release()
    return path


def test_native_lib_built():
    assert native_available(), "run `make -C native` first"


def test_info(video_path):
    with VideoDecoder(video_path) as dec:
        w, h, fps, n = dec.info()
    assert (w, h) == (64, 48)
    assert abs(fps - 10.0) < 0.1


def test_decode_all_frames(video_path):
    frames = decode_video(video_path)
    assert frames.shape == (30, 48, 64, 3)
    # red ramps down over time (RGB order out of the decoder)
    assert frames[0, 0, 0, 0] > frames[-1, 0, 0, 0]
    assert frames[-1, 0, 0, 2] > frames[0, 0, 0, 2]


def test_decode_interval_and_resize(video_path):
    frames = decode_video(video_path, interval=3, out_size=(32, 32))
    assert frames.shape == (10, 32, 32, 3)


def test_decode_matches_cv2(video_path):
    native = decode_video(video_path, interval=2)
    with VideoDecoder.__new__(VideoDecoder) as dec:  # force cv2 fallback
        dec.path = video_path
        dec._h = None
        fallback = dec._cv2_read(2, 4096, (64, 48))
    assert native.shape == fallback.shape
    # same codec, same scaler path modulo colorspace rounding
    assert np.mean(np.abs(native.astype(int) - fallback.astype(int))) < 3


def test_window_decode(video_path):
    with VideoDecoder(video_path) as dec:
        frames = dec.read_window(1.0, 2.0)
    # 10 fps video, 1 second window -> ~10 frames
    assert 8 <= len(frames) <= 12


def test_window_decode_cv2_fallback_matches_native(video_path):
    with VideoDecoder(video_path) as dec:
        native = dec.read_window(1.0, 2.0)
    with VideoDecoder.__new__(VideoDecoder) as dec:  # force cv2 fallback
        dec.path = video_path
        dec._h = None
        fallback = dec.read_window(1.0, 2.0)
    # PTS rounding at the window START may differ by one frame between
    # the two demuxers (cv2's POS_MSEC vs best_effort_timestamp), which
    # shifts the whole sequence; the overlap at the best shift in
    # {-1, 0, +1} must match pixel-wise
    assert abs(len(native) - len(fallback)) <= 1
    assert min(len(native), len(fallback)) >= 8

    def diff_at(shift):
        a = native[max(shift, 0):]
        b = fallback[max(-shift, 0):]
        n = min(len(a), len(b))
        return np.mean(np.abs(a[:n].astype(int) - b[:n].astype(int)))

    assert min(diff_at(s) for s in (-1, 0, 1)) < 3


def test_window_decode_cv2_fallback_empty_window(video_path):
    with VideoDecoder.__new__(VideoDecoder) as dec:
        dec.path = video_path
        dec._h = None
        out = dec.read_window(50.0, 60.0)   # past end of a 3 s video
    assert out.shape == (0, 48, 64, 3)
    assert out.dtype == np.uint8


def test_repeat_reads_on_one_handle(video_path):
    """The native handle must rewind per call: a second read_frames (or
    read_frames after read_window) returns the same frames as the first
    — the old shim resumed at EOF and returned nothing (r3 review
    finding; the cv2 fallback was always stateless)."""
    with VideoDecoder(video_path) as dec:
        a = dec.read_frames()
        _ = dec.read_window(0.5, 1.5)
        b = dec.read_frames()
    assert a.shape == (30, 48, 64, 3)
    np.testing.assert_array_equal(a, b)


def test_output_buffer_capped_by_container_frame_count(video_path):
    """read_frames must not allocate the full default 4096-row buffer
    when the container records the (30-) frame count (r3 review
    finding: ~25 GB per call at 1080p)."""
    with VideoDecoder(video_path) as dec:
        if dec._h:
            assert dec._cap_rows(1, 4096) <= 30 + 8
            assert dec._cap_rows(3, 4096) <= 10 + 8
            assert dec._cap_rows(1, 5) == 5   # caller cap still wins
        frames = dec.read_frames()
    assert frames.shape[0] == 30


def test_iter_frames_chunked_matches_full(video_path):
    """Chunked native-resolution streaming (vd_read_frames_seq) must be
    a lossless re-chunking of the one-shot read: the codec keeps
    undelivered frames buffered across calls (stage-A memory-bound
    decode, r3 verdict item)."""
    with VideoDecoder(video_path) as dec:
        full = dec.read_frames()
        chunks = list(dec.iter_frames(chunk=7))
    assert all(len(c) <= 7 for c in chunks)
    np.testing.assert_array_equal(np.concatenate(chunks), full)


def test_iter_frames_interval_carries_across_chunks(video_path):
    with VideoDecoder(video_path) as dec:
        full = dec.read_frames(interval=3)
        chunks = list(dec.iter_frames(interval=3, chunk=4))
    np.testing.assert_array_equal(np.concatenate(chunks), full)


def test_iter_frames_max_frames_cap(video_path):
    with VideoDecoder(video_path) as dec:
        got = np.concatenate(list(dec.iter_frames(chunk=4, max_frames=9)))
    assert got.shape[0] == 9
