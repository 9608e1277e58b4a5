"""Native async loader: build, correctness, concurrency, npz roundtrip."""

import os

import numpy as np
import pytest

from macarons_tpu.utils import native_loader as NL


def test_native_build_and_roundtrip(tmp_path):
    loader = NL.AsyncLoader(n_threads=3)
    # The C++ library must actually build in this image (g++ is baked in)
    assert loader.native, "native loader failed to build"
    payloads = {}
    jobs = {}
    for i in range(20):
        p = tmp_path / f"f{i}.bin"
        data = os.urandom(1000 + i * 37)
        p.write_bytes(data)
        payloads[i] = data
        jobs[i] = loader.submit(str(p))
    # Out-of-order takes
    for i in reversed(range(20)):
        assert loader.take(jobs[i]) == payloads[i]
    loader.close()


def test_native_missing_file(tmp_path):
    loader = NL.AsyncLoader(n_threads=1)
    j = loader.submit(str(tmp_path / "nope.bin"))
    with pytest.raises(IOError):
        loader.take(j)
    loader.close()


def test_npz_prefetch(tmp_path):
    loader = NL.AsyncLoader(n_threads=2)
    arrs = []
    paths = []
    for i in range(4):
        a = np.random.default_rng(i).normal(size=(16, 3)).astype(np.float32)
        p = tmp_path / f"a{i}.npz"
        np.savez(p, x=a, i=np.int32(i))
        arrs.append(a)
        paths.append(str(p))
    jobs = NL.prefetch_npz(loader, paths)
    for i, j in enumerate(jobs):
        d = NL.take_npz(loader, j)
        np.testing.assert_array_equal(d["x"], arrs[i])
        assert int(d["i"]) == i
    loader.close()


def test_memory_uses_async_loader(tmp_path):
    from macarons_tpu.scene.memory import Memory

    mem = Memory([str(tmp_path / "s")])
    sp = str(tmp_path / "s")
    for i in range(4):
        mem.save_frame(sp, i, np.full((1, 4, 4, 3), i, np.float32),
                       np.zeros((1, 4, 4, 1)), np.ones((1, 4, 4, 1), bool),
                       np.eye(3)[None], np.zeros((1, 3)), 10.0)
    seq = mem.load_frame_sequence(sp, 3, 3)
    np.testing.assert_array_equal(seq["images"][:, 0, 0, 0], [1, 2, 3])
    assert Memory._async_loader().native
