"""Native threaded block codec + .ce5g container tests.

Covers: byte-exact round-trips across dtypes/shapes (incl. unicode and
empty arrays), the zlib fallback path, multi-block buffers, corrupt-stream
rejection, and end-to-end DatasetGenerator integration with
save_format='ce5g' (chunk/resume/merge/read_split).
"""
import numpy as np
import pytest

from ce5g_tpu.native import (
    compress_blocks,
    decompress_blocks,
    have_native,
)
from ce5g_tpu.data.ce5g_format import read_ce5g, write_ce5g


def _arrays(rng):
    c = (rng.standard_normal((7, 6, 2, 39)) + 1j * rng.standard_normal((7, 6, 2, 39)))
    return {
        "H_true": c.astype(np.complex64),
        "mask": rng.integers(0, 2, (7, 6, 39)).astype(np.float32),
        "snr_db": rng.uniform(-5, 30, (7,)).astype(np.float32),
        "profile_idx": rng.integers(0, 3, (7,)).astype(np.int32),
        "channel_type": np.asarray(["EPA", "EVA", "ETU", "EPA", "EVA", "ETU", "EPA"]).astype("<U10"),
        "empty": np.zeros((0, 4), np.float32),
        "scalarish": np.asarray(3.5, np.float64).reshape(()),
    }


def test_native_lib_builds():
    # The container image has g++ and zstd; the native path must be live
    # here (the zlib fallback is exercised separately).
    assert have_native()


@pytest.mark.parametrize("itemsize", [1, 4, 8])
def test_block_roundtrip_multiblock(itemsize):
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=3 * 4096 + 123, dtype=np.uint8).tobytes()
    packed, sizes, backend = compress_blocks(
        raw, block_size=4096, itemsize=itemsize
    )
    assert len(sizes) == 4
    back = decompress_blocks(
        packed, sizes, len(raw), block_size=4096, itemsize=itemsize, backend=backend
    )
    assert bytes(back) == raw


def test_zlib_fallback_roundtrip(monkeypatch):
    import ce5g_tpu.native as native

    monkeypatch.setattr(native, "get_lib", lambda: None)
    raw = np.arange(10000, dtype=np.float32).tobytes()
    packed, sizes, backend = compress_blocks(raw, block_size=8192, itemsize=4)
    assert backend == "zlib"
    back = decompress_blocks(
        packed, sizes, len(raw), block_size=8192, itemsize=4, backend="zlib"
    )
    assert bytes(back) == raw


def test_empty_buffer():
    packed, sizes, backend = compress_blocks(b"")
    assert sizes == []
    back = decompress_blocks(packed, sizes, 0, backend=backend)
    assert bytes(back) == b""


def test_ce5g_container_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    arrays = _arrays(rng)
    p = tmp_path / "chunk.ce5g"
    write_ce5g(p, arrays)
    back = read_ce5g(p)
    assert set(back) == set(arrays)
    for k, a in arrays.items():
        got = back[k]
        assert got.shape == a.shape, k
        if a.dtype.kind == "U":
            assert list(got) == list(a)
        else:
            assert got.dtype == a.dtype, k
            np.testing.assert_array_equal(got, a, err_msg=k)


def test_ce5g_rejects_non_ce5g(tmp_path):
    p = tmp_path / "junk.ce5g"
    p.write_bytes(b"definitely not a ce5g file")
    with pytest.raises(ValueError, match="not a .ce5g"):
        read_ce5g(p)


def test_ce5g_corrupt_payload(tmp_path):
    rng = np.random.default_rng(2)
    p = tmp_path / "chunk.ce5g"
    write_ce5g(p, {"x": rng.standard_normal((64, 64)).astype(np.float32)})
    blob = bytearray(p.read_bytes())
    blob[-20:] = b"\x00" * 20  # stomp compressed payload
    p.write_bytes(bytes(blob))
    with pytest.raises(ValueError):
        read_ce5g(p)


def test_generator_ce5g_end_to_end(tmp_path, small_cfg):
    import dataclasses

    from ce5g_tpu.data.generator import DatasetGenerator, read_split

    cfg = dataclasses.replace(
        small_cfg,
        dataset=dataclasses.replace(
            small_cfg.dataset, save_format="ce5g", chunk_size=4
        ),
        pilots=dataclasses.replace(small_cfg.pilots, density=(0.1,)),
    )
    gen = DatasetGenerator(cfg, str(tmp_path))
    m = gen.generate_split("train", 6, log=lambda *a: None)
    assert m["completed"] == 6
    assert all(f.endswith(".ce5g") for f in m["files"])

    arrays = read_split(str(tmp_path / "train_manifest.json"))
    assert arrays["H_true"].shape[0] == 6
    assert arrays["H_true"].dtype == np.complex64
    assert arrays["channel_type"].dtype.kind == "U"

    # resume with a larger total reuses the full prefix chunk and appends
    m2 = gen.generate_split("train", 10, resume=True, log=lambda *a: None)
    assert m2["completed"] == 10
    arrays2 = read_split(str(tmp_path / "train_manifest.json"))
    np.testing.assert_array_equal(
        arrays2["H_true"][:4], arrays["H_true"][:4]
    )

    merged = gen.merge_split("train")
    assert merged.endswith("train.ce5g")
    arrays3 = read_split(merged)
    np.testing.assert_array_equal(arrays3["H_true"], arrays2["H_true"])


def test_trainer_dataset_reads_ce5g(tmp_path, small_cfg):
    import dataclasses

    from ce5g_tpu.data.generator import DatasetGenerator
    from ce5g_tpu.train.datasets import ChannelDataset

    cfg = dataclasses.replace(
        small_cfg,
        dataset=dataclasses.replace(
            small_cfg.dataset, save_format="ce5g", chunk_size=4
        ),
    )
    gen = DatasetGenerator(cfg, str(tmp_path))
    gen.generate_split("val", 4, log=lambda *a: None)
    merged = gen.merge_split("val")
    ds = ChannelDataset(merged)
    assert len(ds) == 4
