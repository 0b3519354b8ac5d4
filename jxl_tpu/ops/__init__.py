from jxl_tpu.ops.pallas_dct import dct_quantize_pallas, dct_quantize_reference  # noqa: F401
