"""Native pfchunk container tests: write -> C++ mmap read -> parity with the
torch-pickle path."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="needs g++"
)


def test_roundtrip(tmp_path):
    from pf3plat_tpu.native import PfChunkReader, write_pfchunk

    rng = np.random.default_rng(0)
    scenes = []
    for s in range(3):
        n = 4 + s
        cams = rng.standard_normal((n, 18)).astype(np.float32)
        # make the w2c rows valid rigid transforms
        for f in range(n):
            cams[f, 6:] = np.hstack(
                [np.eye(3), rng.standard_normal((3, 1))]
            ).reshape(-1)
        scenes.append({
            "key": f"scene_{s}",
            "cameras": cams,
            "images": [bytes(rng.integers(0, 256, 100, dtype=np.uint8))
                       for _ in range(n)],
        })
    path = tmp_path / "c.pfchunk"
    write_pfchunk(path, scenes)

    r = PfChunkReader(path)
    assert len(r) == 3
    for s in range(3):
        assert r.key(s) == f"scene_{s}"
        assert r.num_frames(s) == 4 + s
        np.testing.assert_array_equal(r.cameras(s), scenes[s]["cameras"])
        for f in range(r.num_frames(s)):
            assert r.jpeg(s, f) == scenes[s]["images"][f]
    r.close()


def test_native_pose_decode_matches_python(tmp_path):
    from pf3plat_tpu.data.dataset import convert_poses
    from pf3plat_tpu.native import PfChunkReader, write_pfchunk

    rng = np.random.default_rng(1)
    n = 6
    cams = np.zeros((n, 18), np.float32)
    cams[:, :4] = [0.9, 1.1, 0.5, 0.48]
    for f in range(n):
        a = rng.standard_normal((3, 3))
        q, rr = np.linalg.qr(a)
        q *= np.sign(np.diag(rr))
        q[:, 0] *= np.sign(np.linalg.det(q))
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = q
        w2c[:3, 3] = rng.standard_normal(3)
        cams[f, 6:] = w2c[:3].reshape(-1)
    path = tmp_path / "p.pfchunk"
    write_pfchunk(path, [{"key": "x", "cameras": cams,
                          "images": [b"" for _ in range(n)]}])

    r = PfChunkReader(path)
    c2w_native, intr_native = r.poses(0)
    c2w_py, intr_py = convert_poses(cams)
    np.testing.assert_allclose(c2w_native, c2w_py, atol=1e-5)
    np.testing.assert_allclose(intr_native, intr_py, atol=1e-6)
    r.close()


def test_convert_torch_chunk(tmp_path):
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "tests")
    from test_data import make_chunk

    from pf3plat_tpu.native import PfChunkReader, convert_torch_chunk

    tp = tmp_path / "000000.torch"
    make_chunk(tp, n_scenes=2, n_frames=5, seed=0)
    out = tmp_path / "000000.pfchunk"
    n = convert_torch_chunk(tp, out)
    assert n == 2

    r = PfChunkReader(out)
    assert len(r) == 2
    # JPEG bytes should decode to the original resolution.
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(r.jpeg(0, 0)))
    assert img.size == (128, 72)
    r.close()


def test_chunk_dataset_reads_pfchunk(tmp_path):
    pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "tests")
    from test_data import make_chunk

    from pf3plat_tpu.data.dataset import ChunkDataset, DatasetCfg
    from pf3plat_tpu.data.view_samplers import AllViewSampler
    from pf3plat_tpu.native import convert_torch_chunk

    train = tmp_path / "train"
    train.mkdir()
    make_chunk(train / "000000.torch", n_scenes=1, n_frames=6, seed=0)
    convert_torch_chunk(train / "000000.torch", train / "000000.pfchunk")
    (train / "000000.torch").unlink()  # only the native container remains

    cfg = DatasetCfg(roots=[tmp_path], image_shape=(64, 64),
                     original_image_shape=(72, 128))
    ds = ChunkDataset(cfg, AllViewSampler(), stage="train", seed=0)
    assert len(ds.chunks) == 1 and ds.chunks[0].suffix == ".pfchunk"
    ex = next(iter(ds))
    assert ex["context"]["image"].shape[1:] == (64, 64, 3)
