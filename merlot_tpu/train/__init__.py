from merlot_tpu.train.optimizer import AdamWConfig, MerlotAdamW  # noqa: F401
