"""Video IO round trips (cv2 fallback paths; ffmpeg absent in CI)."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from islx.pipeline.video import FrameSource, FrameWriter, probe


@pytest.fixture
def clip(tmp_path, rng):
    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12, (64, 48))
    assert w.isOpened()
    frames = [(rng.rand(48, 64, 3) * 255).astype(np.uint8) for _ in range(9)]
    for f in frames:
        w.write(f)
    w.release()
    return path, frames


def test_probe(clip):
    path, frames = clip
    meta = probe(path)
    assert (meta.width, meta.height) == (64, 48)
    assert abs(meta.fps - 12) < 0.5
    assert meta.n_frames in (-1, 9)


def test_source_reads_all(clip):
    path, frames = clip
    with FrameSource(path) as src:
        got = list(src)
    assert len(got) == 9
    assert got[0].shape == (48, 64, 3)


def test_writer_roundtrip(tmp_path, clip):
    path, frames = clip
    out = str(tmp_path / "out.mp4")
    with FrameWriter(out, 12, (48, 64)) as w:
        for f in frames:
            w(f)
    meta = probe(out)
    assert (meta.width, meta.height) == (64, 48)
    with FrameSource(out) as src:
        assert len(list(src)) == 9


class TestPrefetcher:
    def test_order_preserved(self):
        from islx.pipeline.video import Prefetcher

        got = list(Prefetcher(iter(range(100)), depth=3))
        assert got == list(range(100))

    def test_producer_exception_propagates(self):
        from islx.pipeline.video import Prefetcher

        def gen():
            yield 1
            yield 2
            raise ValueError("decode failed")

        it = iter(Prefetcher(gen()))
        assert next(it) == 1
        assert next(it) == 2
        import pytest as _pytest

        with _pytest.raises(ValueError, match="decode failed"):
            next(it)

    def test_empty(self):
        from islx.pipeline.video import Prefetcher

        assert list(Prefetcher(iter(()))) == []


def test_flat_batches_padding():
    from islx.pipeline.video import flat_batches

    frames = [np.full(6, i, np.uint8) for i in range(5)]
    out = list(flat_batches(iter(frames), 2))
    assert [n for _, n in out] == [2, 2, 1]
    assert out[0][0].tolist() == [0] * 6 + [1] * 6
    assert out[2][0].tolist() == [4] * 6 + [4] * 6   # tail pad repeats last
    assert list(flat_batches(iter([]), 2)) == []


def test_yuv_source_requires_ffmpeg(clip):
    import shutil

    from islx.pipeline.video import YUVFrameSource

    path, _ = clip
    if shutil.which("ffmpeg") is None:
        with pytest.raises(RuntimeError):
            YUVFrameSource(path, (48, 64))
    else:
        with YUVFrameSource(path, (48, 64)) as src:
            got = list(src)
        assert len(got) == 9
        assert got[0].shape == (48 * 64 * 3 // 2,)
