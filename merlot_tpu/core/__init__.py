from merlot_tpu.core.config import NeatConfig  # noqa: F401
