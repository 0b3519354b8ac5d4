from jxl_tpu.distributed.mesh import make_mesh  # noqa: F401
