from jxl_tpu.core.xyb import srgb_to_xyb, xyb_to_srgb  # noqa: F401
from jxl_tpu.core.image import ImageFileData, ColorType, ImageFormat  # noqa: F401
