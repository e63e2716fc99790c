"""CLI end-to-end: compress -> decompress -> build -> search on a tiny
config, exercising the full reference surface in-process."""
import json
from pathlib import Path

import numpy as np
import pytest

FIXTURE_CFG = str(Path(__file__).parent / "fixtures" / "config_tiny.yaml")


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    from PIL import Image
    for i, hw in enumerate([(200, 300), (256, 256)]):
        arr = (rng.uniform(size=(*hw, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"img_{i}.png")
    return root


def test_config_loading():
    from sic_tpu.config import load_config
    cfg = load_config(FIXTURE_CFG)
    assert cfg.spec.titok.model_size == "tiny"
    assert cfg.spec.quant_dim == 16
    assert cfg.spec.merge_inner_width == 128
    assert cfg.strategy is not None and cfg.strategy.total_epochs == 3
    assert cfg.img_cfg.disc_ndf == 16


def test_compress_decompress_build_search(workdir):
    from sic_tpu.cli import build as build_cli
    from sic_tpu.cli import compress as compress_cli
    from sic_tpu.cli import decompress as decompress_cli
    from sic_tpu.cli import search as search_cli

    save_dir = workdir / "out"
    compress_cli.main(["--base_config", FIXTURE_CFG,
                       "--dataset_dir", str(workdir / "images"),
                       "--save_dir", str(save_dir)])
    c2dfs = sorted((save_dir / "bitstreams").glob("*.c2df"))
    assert len(c2dfs) == 2
    assert (save_dir / "faiss" / "index.faiss").exists()
    assert (save_dir / "faiss" / "faiss.index").exists()

    rec_dir = workdir / "rec"
    decompress_cli.main(["--base_config", FIXTURE_CFG,
                         "--dataset_dir", str(save_dir / "bitstreams"),
                         "--save_dir", str(rec_dir)])
    pngs = sorted(rec_dir.glob("*.png"))
    assert len(pngs) == 2
    from PIL import Image
    # padding cropped: reconstruction matches ORIGINAL size
    assert Image.open(rec_dir / "img_0.png").size == (300, 200)

    # rebuild index from the bitstreams alone (no model)
    idx_dir = workdir / "faiss2"
    build_cli.main(["build", "--c2df_dir", str(save_dir / "bitstreams"),
                    "--index_dir", str(idx_dir)])

    # self-search by c2df payload must rank itself first
    out = search_cli.do_search(
        search_cli.encode_c2df_query(c2dfs[0]),
        __import__("sic_tpu.retrieval", fromlist=["VectorIndex"])
        .VectorIndex.load(idx_dir)[0], topk=2)
    assert out[0][0].endswith("img_0.c2df")
    assert out[0][1] == pytest.approx(1.0, abs=5e-3)  # bf16 MXU scoring


def test_evaluate_cli(workdir, capsys):
    import json
    from sic_tpu.cli import evaluate as eval_cli
    eval_cli.main(["--base_config", FIXTURE_CFG,
                   "--dataset_dir", str(workdir / "images")])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.strip().startswith("{")]
    summary = lines[-1]
    assert summary["type"] == "summary" and summary["n"] == 2
    assert summary["mean_bpp"] > 0
    assert np.isfinite(summary["mean_psnr"])
    per_img = lines[0]
    assert "ms_ssim" in per_img  # images are >=176px


def test_build_images_desired_and_model_id(workdir, monkeypatch, tmp_path):
    """build-images parity flags: --desired caps the selection (wins over
    --limit) and --model_id is recorded in meta.json (reference:
    build.py:209-240)."""
    from sic_tpu.cli import build as build_cli
    from sic_tpu.retrieval import VectorIndex

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    from PIL import Image
    for i in range(5):
        arr = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"im_{i}.png")

    class _StubCodec:
        model_id = "ViT-B-32:laion2b_s34b_b79k"

        class spec:
            embed_dim = 8

        def images_to_unit_vecs(self, batch):
            v = rng.standard_normal((batch.shape[0], 8)).astype(np.float32)
            return v / np.linalg.norm(v, axis=1, keepdims=True)

    monkeypatch.setattr(build_cli, "load_clip_codec",
                        lambda *a, **k: _StubCodec())

    idx_dir = tmp_path / "idx"
    build_cli.main(["build-images", "--image_dir", str(img_dir),
                    "--index_dir", str(idx_dir),
                    "--desired", "3", "--limit", "5",
                    "--model_id", "ViT-L-14:laion2b_s32b_b82k"])
    index, meta = VectorIndex.load(idx_dir)
    assert index.ntotal == 3
    assert meta["model_id"] == "ViT-L-14:laion2b_s32b_b82k"

    # shortfall helper is a no-op without --auto_download (no egress here)
    build_cli.ensure_images_count(img_dir, desired=99, auto_download=False)
    assert len(list(img_dir.glob("*.png"))) == 5


def test_generate_cli(tmp_path):
    """MaskGIT-prior sampling end to end: tokens -> TiTok pixel decode ->
    PNGs, deterministic for a fixed seed (reference capability:
    titok/maskgit.py:81-137, unexposed there)."""
    from PIL import Image

    from sic_tpu.cli import generate as gen_cli

    out_a, out_b = tmp_path / "a", tmp_path / "b"
    args = ["--classes", "1,3", "--seed", "5", "--steps", "4", "--tiny"]
    names = gen_cli.main(["--save_dir", str(out_a)] + args)
    assert len(names) == 2
    ims = [Image.open(out_a / n) for n in names]
    assert all(im.size == ims[0].size and im.size[0] >= 32 for im in ims)

    gen_cli.main(["--save_dir", str(out_b)] + args)
    for n in names:
        assert (out_a / n).read_bytes() == (out_b / n).read_bytes()


def test_build_images_indexes_download_dir(tmp_path, monkeypatch):
    """A separate --download_dir must be part of the indexed corpus —
    otherwise images fetched to satisfy --desired are never used."""
    from sic_tpu.cli import build as build_cli
    from sic_tpu.retrieval import VectorIndex

    rng = np.random.default_rng(2)
    from PIL import Image
    dirs = {"a": tmp_path / "a", "b": tmp_path / "b"}
    for j, (tag, d) in enumerate(dirs.items()):
        d.mkdir()
        for i in range(2 + j):
            arr = (rng.uniform(size=(16, 16, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{tag}{i}.png")

    class _StubCodec:
        model_id = "m"

        class spec:
            embed_dim = 4

        def images_to_unit_vecs(self, batch):
            v = rng.standard_normal((batch.shape[0], 4)).astype(np.float32)
            return v / np.linalg.norm(v, axis=1, keepdims=True)

    monkeypatch.setattr(build_cli, "load_clip_codec",
                        lambda *a, **k: _StubCodec())
    idx_dir = tmp_path / "idx"
    build_cli.main(["build-images", "--image_dir", str(dirs["a"]),
                    "--index_dir", str(idx_dir),
                    "--download_dir", str(dirs["b"])])
    index, _ = VectorIndex.load(idx_dir)
    assert index.ntotal == 5  # 2 from image_dir + 3 from download_dir
