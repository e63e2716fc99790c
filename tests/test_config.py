"""Config-system tests: reference YAML ingestion + QP preset parity.

The eight shipped training configs are parsed straight from the reference
tree and compared against our built-in presets field by field.
"""
from pathlib import Path

import pytest

from conftest import reference_fixture
from sic_tpu.config import flagship_spec, load_config, qp_strategy

REF_TRAIN = Path("/root/reference/src/config/train")



from conftest import requires_reference

pytestmark = requires_reference()

def test_flagship_spec_matches_reference_test_config():
    cfg = load_config(reference_fixture("src/config/config_test.yaml"))
    spec = cfg.spec
    flag = flagship_spec()
    assert spec.titok == flag.titok
    assert spec.vqgan.ch_mult == flag.vqgan.ch_mult
    assert spec.vqgan.n_embed == flag.vqgan.n_embed
    assert spec.feat_width == 768 and spec.quant_dim == 64
    assert spec.insert_pos_enc == (3, 7, 11, 15, 19)
    assert cfg.img_cfg.disc_weight == 0.75
    assert cfg.feat_cfg.ce_weight == 0.25
    assert cfg.strategy is not None


@pytest.mark.parametrize("qp", [0, 1, 2, 3])
@pytest.mark.parametrize("px", [256, 512])
def test_qp_presets_match_reference_yamls(qp, px):
    ref = load_config(REF_TRAIN / f"config_qp{qp}_{px}train.yaml").strategy
    ours = qp_strategy(qp, px)
    assert ours.learning_rate == ref.learning_rate
    for mine, theirs in zip(ours.stages, ref.stages):
        assert mine.epoch_num == theirs.epoch_num
        assert mine.init_lmbda_idx == theirs.init_lmbda_idx
        assert mine.lmbda_list == pytest.approx(theirs.lmbda_list)
        assert mine.bpp_upper == theirs.bpp_upper
        assert mine.bpp_lower == theirs.bpp_lower
