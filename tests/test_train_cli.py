"""train CLI smoke: 3 micro-epochs through all stages + orbax checkpoint +
resume with schedule reset (the reference's ignore_keys workflow)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("trainimgs")
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = (rng.uniform(size=(300, 280, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / f"t{i}.png")
    return root


def test_train_cli_all_stages_and_resume(img_dir, tmp_path):
    from sic_tpu.cli import train as train_cli

    ckpt_dir = tmp_path / "ckpts"
    args = ["--tiny", "--train_dir", str(img_dir), "--val_dir", str(img_dir),
            "--batch_size", "1", "--ckpt_dir", str(ckpt_dir), "--qp", "0"]
    train_cli.main(args + ["--epochs", "3"])
    assert (ckpt_dir / "last").exists()
    # stage-transition checkpoints got written
    names = [p.name for p in ckpt_dir.iterdir()]
    assert any(n.startswith("feat_wo_bpp_epo_for_strategy") for n in names)

    # resume with schedule reset (ignore_keys counterpart)
    train_cli.main(args + ["--epochs", "1", "--resume", str(ckpt_dir / "last"),
                           "--reset_schedule"])
