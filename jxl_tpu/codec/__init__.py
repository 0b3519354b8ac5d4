from jxl_tpu.codec.config import CodecConfig, Strategy  # noqa: F401
from jxl_tpu.codec.encode import encode_image  # noqa: F401
from jxl_tpu.codec.decode import decode_bytes  # noqa: F401
