"""Tests for the breadth components: draw, video, extract, dataset, summary,
caffe reader, CLI wiring."""
import json
import os
import struct

import numpy as np
import pytest

from conftest import REFERENCE, has_reference


class TestDraw:
    def test_draw_bodypose(self, rng):
        from islx.utils import draw

        canvas = np.zeros((100, 120, 3), np.uint8)
        candidate = np.array([[10.0, 20.0, 0.9, 0], [50.0, 60.0, 0.8, 1],
                              [30.0, 40.0, 0.7, 2]])
        subset = -1 * np.ones((1, 27))
        subset[0, 0], subset[0, 1], subset[0, 2] = 0, 1, 2
        out = draw.draw_bodypose(canvas, candidate, subset, "body25")
        assert out.shape == canvas.shape
        assert out.sum() > 0

    def test_draw_handpose(self, rng):
        from islx.utils import draw

        canvas = np.zeros((100, 100, 3), np.uint8)
        peaks = rng.randint(10, 90, (21, 2))
        out = draw.draw_handpose(canvas, [peaks])
        assert out.shape == canvas.shape
        assert out.sum() > 0

    def test_crop_to_drawing(self):
        from islx.utils import draw

        img = np.zeros((50, 60, 3), np.uint8)
        img[10:20, 30:45] = 255
        out = draw.crop_to_drawing(img)
        assert out.shape == (10, 15, 3)


class TestCaffeReader:
    def _encode_varint(self, v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    def _field(self, num, wt, payload):
        return self._encode_varint((num << 3) | wt) + payload

    def _len_field(self, num, data):
        return self._field(num, 2, self._encode_varint(len(data)) + data)

    def test_roundtrip(self, tmp_path, rng):
        from islx.core.caffe_reader import read_caffemodel

        w = rng.randn(4, 3, 3, 3).astype(np.float32)
        b = rng.randn(4).astype(np.float32)

        def blob(arr):
            shape_payload = b"".join(self._encode_varint(d) for d in arr.shape)
            blob_shape = self._len_field(1, shape_payload)  # packed dims
            data = arr.astype("<f4").tobytes()
            return (self._len_field(7, blob_shape)          # BlobShape msg
                    + self._len_field(5, data))             # packed floats

        layer = (self._len_field(1, b"conv1_1")
                 + self._len_field(7, blob(w)) + self._len_field(7, blob(b)))
        net = self._len_field(100, layer)
        path = tmp_path / "test.caffemodel"
        path.write_bytes(net)
        out = read_caffemodel(str(path))
        np.testing.assert_array_equal(out["conv1_1.weight"], w)
        np.testing.assert_array_equal(out["conv1_1.bias"], b)


class TestSummary:
    def test_hand_output_size_matches_reference_lut(self):
        from islx.utils.summary import hand_output_size_table

        table = hand_output_size_table()
        lut_path = os.path.join(REFERENCE, "src", "hand_model_output_size.json")
        if has_reference() and os.path.exists(lut_path):
            with open(lut_path) as f:
                want = json.load(f)
            for k, v in want.items():
                assert table[k] == v, k
        else:
            assert table["368"] == 46

    def test_summarize_totals(self):
        from islx.models import cpm
        from islx.utils.summary import summarize

        s = summarize("hand")
        assert f"{cpm.param_count('hand'):,}" in s


class TestExtractDataset:
    def _fake_pose(self, frame):
        candidate = np.array([[10.0, 20.0, 0.9, 0.0], [30.0, 40.0, 0.8, 1.0]])
        subset = -1 * np.ones((1, 27))
        subset[0, 0], subset[0, 1] = 0, 1
        subset[0, -2:] = [1.7, 2]
        hands = [np.array([[5 + i, 6 + i] for i in range(21)])]
        return candidate, subset, hands

    def test_save_and_rebuild(self, tmp_path):
        from islx.core.config import TranslatorConfig
        from islx.isl import dataset as D
        from islx.isl.extract import ExtractConfig, is_processed, save_frame

        cfg = ExtractConfig(out_root=str(tmp_path))
        cand, subset, hands = self._fake_pose(None)
        for i in range(6):
            assert not is_processed(cfg, "vid1", i)
            row = save_frame(cfg, "vid1", i, cand, subset, hands)
            assert is_processed(cfg, "vid1", i)
            assert row["frame"] == i and "f0" in row and "f155" in row

        status = D.build_status(str(tmp_path))
        assert status.iloc[0]["processed"] == 6
        table = D.build_table(str(tmp_path))
        assert len(table) == 6
        assert "bodypeaks_x_0" in table.columns
        assert table["bodypeaks_x_0"].iloc[0] == 10.0

        x, y = D.build_windows(str(tmp_path), {"vid1": "Hello"},
                               TranslatorConfig())
        assert x.shape == (1, 20, 156)
        assert y[0] == 36  # "Hello" id in the vocabulary
        assert np.all(x[0, 6:] == 0)  # padded tail

    def test_corrupt_json_skipped(self, tmp_path):
        from islx.isl import dataset as D
        from islx.isl.extract import ExtractConfig, save_frame

        cfg = ExtractConfig(out_root=str(tmp_path))
        cand, subset, hands = self._fake_pose(None)
        save_frame(cfg, "vid1", 0, cand, subset, hands)
        with open(tmp_path / "vid1" / "000001.json", "w") as f:
            f.write("{broken")
        table = D.build_table(str(tmp_path))
        assert len(table) == 1

    def test_shard_rows(self):
        from islx.isl.extract import shard_rows

        rows = list(range(10))
        parts = [shard_rows(rows, i, 3) for i in range(3)]
        assert sorted(sum(parts, [])) == rows
        assert all(len(p) >= 3 for p in parts)


class TestVideo:
    def test_frame_batcher_padding(self):
        from islx.pipeline.video import FrameBatcher

        frames = [np.full((30, 40, 3), i, np.uint8) for i in range(5)]
        batches = list(FrameBatcher(4, (16, 24))(frames))
        assert len(batches) == 2
        (b1, n1), (b2, n2) = batches
        assert b1.shape == (4, 16, 24, 3) and n1 == 4
        assert b2.shape == (4, 16, 24, 3) and n2 == 1
        # tail padded with the last frame
        np.testing.assert_array_equal(b2[1], b2[3])


class TestCLI:
    def test_convert_roundtrip(self, tmp_path, rng):
        import torch

        from islx.cli import convert
        from islx.core import weights as W
        from islx.models import cpm

        params = cpm.init_params("hand")
        flat = W.to_flat_dict(params)
        src = str(tmp_path / "hand.pt")
        torch.save({k: torch.from_numpy(np.asarray(v))
                    for k, v in flat.items()}, src)
        dst = str(tmp_path / "hand.npz")
        convert.main([src, dst, "--model-type", "hand"])
        p2 = W.load_npz(dst, "hand")
        np.testing.assert_allclose(np.asarray(p2["conv1_1"]["w"]),
                                   np.asarray(params["conv1_1"]["w"]))

    def test_demo_on_reference_image(self, tmp_path):
        """End-to-end CLI smoke test with random weights on demo.jpg."""
        if not has_reference():
            pytest.skip("no reference image")
        from islx.cli import demo

        out = str(tmp_path / "out.png")
        demo.main([os.path.join(REFERENCE, "images", "demo.jpg"),
                   "--out", out])
        assert os.path.exists(out)


class TestAugment:
    def test_rotation_ccw_matches_rot90(self):
        import jax.numpy as jnp

        from islx.ops.augment import rotate_nearest

        img = np.zeros((20, 20, 3), np.uint8)
        img[5, 5] = 200
        r = np.asarray(rotate_nearest(jnp.asarray(img), jnp.float32(90.0)))
        want = np.rot90(img)
        ys, xs, _ = np.nonzero(r)
        wys, wxs, _ = np.nonzero(want)
        assert (ys[0], xs[0]) == (wys[0], wxs[0])

    def test_solarize(self):
        import jax.numpy as jnp

        from islx.ops.augment import solarize

        x = np.array([[100, 200]], np.uint8)[:, :, None]
        out = np.asarray(solarize(jnp.asarray(x), 128))
        assert out.ravel().tolist() == [100, 55]

    def test_deterministic_extract_augment(self, tmp_path):
        from islx.isl.extract import ExtractConfig, _augment_frame

        cfg = ExtractConfig(out_root=str(tmp_path), augment=True)
        frame = (np.random.RandomState(0).rand(24, 24, 3) * 255).astype(
            np.uint8)
        a = _augment_frame(cfg, "vid", 3, frame)
        b = _augment_frame(cfg, "vid", 3, frame)
        c = _augment_frame(cfg, "vid", 4, frame)
        np.testing.assert_array_equal(a, b)       # idempotent reruns
        assert not np.array_equal(a, c)           # varies across frames


class TestBatchedExtract:
    def test_batched_extract_and_resume(self, tmp_path):
        """extract_video_batched writes the same per-frame record contract
        and skips already-processed frames on rerun (crash-resume)."""
        import cv2
        import jax.numpy as jnp

        from islx.core.config import HandConfig, PoseConfig
        from islx.isl.extract import ExtractConfig, extract_video_batched
        from islx.models import cpm
        from islx.pipeline.batch_pose import FusedPosePipeline

        clip = str(tmp_path / "c.mp4")
        w = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 15,
                            (96, 72))
        rng = np.random.RandomState(0)
        base = (rng.rand(72, 96, 3) * 255).astype(np.uint8)
        for i in range(10):
            w.write(np.roll(base, i * 5, axis=1))
        w.release()

        pipe = FusedPosePipeline(
            cpm.init_params("body25"), cpm.init_params("hand"),
            pose_cfg=PoseConfig(model_type="body25", max_peaks=8),
            hand_cfg=HandConfig(scale_search=(0.25,)),
            compute_dtype=jnp.float32)
        cfg = ExtractConfig(out_root=str(tmp_path / "out"))
        rows = extract_video_batched(cfg, pipe, clip, batch=4)
        assert len(rows) == 10
        assert os.path.exists(os.path.join(
            cfg.out_root, "c.mp4", "000009.json"))
        # rerun: everything already processed -> no rows
        assert extract_video_batched(cfg, pipe, clip, batch=4) == []
