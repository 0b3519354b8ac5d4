"""Strategy activation-matrix parity (SURVEY §2.4) + config invariants."""

from jxl_tpu.codec.config import CodecConfig, Strategy


def test_strategy_activation_matrix():
    # | variant | hook A | hook B |  (SURVEY §2.4)
    assert Strategy.BASELINE.hook_a is False
    assert Strategy.BASELINE.hook_b is False
    assert Strategy.HOMOGENEITY_PARTITIONING.hook_a is True
    assert Strategy.HOMOGENEITY_PARTITIONING.hook_b is False
    assert Strategy.HOMOGENEITY_FACTORED_ENTROPY.hook_a is False
    assert Strategy.HOMOGENEITY_FACTORED_ENTROPY.hook_b is True
    assert Strategy.COMBINED.hook_a is True
    assert Strategy.COMBINED.hook_b is True


def test_effort_gates():
    assert not CodecConfig(effort=3).use_acs
    assert CodecConfig(effort=4).use_acs
    assert not CodecConfig(effort=5).acs_large_blocks
    assert CodecConfig(effort=6).acs_large_blocks


def test_config_hashable():
    # used as jit static argument material
    hash(CodecConfig())
    assert CodecConfig() == CodecConfig(distance=1.0)


def test_distance_floor_roundtrip():
    import numpy as np

    from jxl_tpu.codec.decode import decode_bytes
    from jxl_tpu.codec.encode import encode_image
    from jxl_tpu.metrics import calculate_psnr
    from tests.conftest import make_test_image

    img = make_test_image(32, 32, seed=5)
    data = encode_image(img, CodecConfig(distance=0.0, effort=3))
    out = decode_bytes(data)
    assert calculate_psnr(img, out) > 40.0
    assert out.dtype == np.uint8
