"""Multi-host (DCN) corpus compression: two real processes, shared output
dir, host-0 index merge — must reproduce the single-process run.

(reference counterpart: src/compress.py:206-246 DistributedSampler shard +
293-306 rank-0 barrier/merge, driven here through JAX's coordination
service instead of NCCL.)
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.test_cli import FIXTURE_CFG

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_corpus(root: Path, n: int = 4):
    from PIL import Image
    rng = np.random.default_rng(7)
    img_dir = root / "imgs"
    img_dir.mkdir(parents=True)
    for i in range(n):
        arr = (rng.uniform(size=(80 + 8 * i, 100, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"img_{i}.png")
    return img_dir


def _subproc_env(extra_env=None):
    """One CPU device per emulated host: strip the suite's 8-device
    XLA_FLAGS (inherited through os.environ) so each rank models one
    single-chip host, and force the CPU platform (the CLI re-asserts it
    via jax.config — see cli._common.respect_platform_env)."""
    return dict(os.environ,
                JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=1",
                JAX_COMPILATION_CACHE_DIR="/tmp/sic_tpu_xla_cache",
                JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
                **(extra_env or {}))


def _run_compress(img_dir, save_dir, extra_env=None, extra_args=()):
    env = _subproc_env(extra_env)
    return subprocess.Popen(
        [sys.executable, "-m", "sic_tpu.cli.compress",
         "--base_config", str(FIXTURE_CFG),
         "--dataset_dir", str(img_dir), "--save_dir", str(save_dir),
         *extra_args],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def test_two_process_run_matches_single_process(tmp_path):
    img_dir = _make_corpus(tmp_path)

    # single-process reference run
    single_dir = tmp_path / "single"
    p = _run_compress(img_dir, single_dir)
    out, err = p.communicate(timeout=1200)
    assert p.returncode == 0, err[-2000:]

    # two processes sharing one save_dir, coordinated over localhost
    multi_dir = tmp_path / "multi"
    port = _free_port()
    procs = [
        _run_compress(img_dir, multi_dir,
                      extra_env={"WORLD_SIZE": "2", "RANK": str(rank),
                                 "MASTER_ADDR": "127.0.0.1",
                                 "MASTER_PORT": str(port)})
        for rank in range(2)
    ]
    errs = [pr.communicate(timeout=1200) for pr in procs]
    for pr, (out, err) in zip(procs, errs):
        assert pr.returncode == 0, err[-2000:]

    # every bitstream byte-identical to the single-process run
    single_bits = sorted((single_dir / "bitstreams").glob("*.c2df"))
    multi_bits = sorted((multi_dir / "bitstreams").glob("*.c2df"))
    assert [p.name for p in multi_bits] == [p.name for p in single_bits]
    assert len(single_bits) == 4
    for a, b in zip(single_bits, multi_bits):
        assert a.read_bytes() == b.read_bytes(), a.name

    # merged index identical: same vectors, same doc order (paths differ
    # only by the run directory prefix)
    from sic_tpu.retrieval import VectorIndex
    idx_s, meta_s = VectorIndex.load(single_dir / "faiss")
    idx_m, meta_m = VectorIndex.load(multi_dir / "faiss")
    np.testing.assert_array_equal(idx_s.vectors(), idx_m.vectors())
    assert [Path(p).name for p in idx_s.ids] == \
           [Path(p).name for p in idx_m.ids]
    assert meta_s.get("dim") == meta_m.get("dim")


def test_two_process_training_runs_and_checkpoints(tmp_path):
    """Multi-host data-parallel training: two processes, one global mesh,
    rank-sliced global batches, XLA cross-host grad all-reduce, rank-0
    checkpointing (the Lightning-DDP counterpart)."""
    # 2 images -> ONE step per rank: the test proves coordination + the
    # cross-host grad all-reduce + rank-0 checkpointing, not training
    # progress, and every extra step is pure wall-clock on a 1-CPU host
    # (this test took ~10 min solo at 2 steps and flaked under suite load)
    img_dir = _make_corpus(tmp_path / "data", n=2)
    port = _free_port()
    ck = tmp_path / "ck"

    def run(rank):
        env = _subproc_env({"WORLD_SIZE": "2", "RANK": str(rank),
                            "MASTER_ADDR": "127.0.0.1",
                            "MASTER_PORT": str(port)})
        return subprocess.Popen(
            [sys.executable, "-m", "sic_tpu.cli.train", "--tiny",
             "--train_dir", str(img_dir), "--train_px", "256",
             "--epochs", "1", "--batch_size", "2",
             "--ckpt_dir", str(ck)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)

    procs = [run(0), run(1)]
    outs = [p.communicate(timeout=1800) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2500:]
    # rank 0 logged finite losses; rank 1 stayed quiet
    logs = [json.loads(l) for l in outs[0][1].splitlines()
            if l.startswith("{")]
    losses = [l for l in logs if "train/align_loss" in l]
    assert losses and all(np.isfinite(l["train/align_loss"]) for l in losses)
    assert not [l for l in outs[1][1].splitlines() if l.startswith("{")]
    # rank 0 wrote the final checkpoint
    assert (ck / "last").exists()


def test_shard_list_covers_everything_once():
    from sic_tpu.parallel.multihost import shard_list
    items = list(range(11))
    shards = [shard_list(items, r, 3) for r in range(3)]
    assert sorted(sum(shards, [])) == items
    assert shards[0] == [0, 3, 6, 9]


def test_setup_distributed_single_process_noop():
    from sic_tpu.parallel.multihost import barrier, setup_distributed
    assert setup_distributed(None, None, None) == (0, 1)
    barrier("noop")  # must not block single-process
