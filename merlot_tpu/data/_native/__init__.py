"""Native (C++) data-path kernels with transparent build-or-fallback.

Importing this package exposes crc32c / masked_crc / read_record_spans /
scan_example from the compiled extension. If the extension isn't built yet
we try to build it once (g++, ~1s); on any failure the import raises and
callers fall back to the pure-python implementations in
merlot_tpu.data.tfrecord.
"""

try:
    from merlot_tpu.data._native._merlot_native import (  # noqa: F401
        crc32c, masked_crc, read_record_spans, scan_example)
except ImportError:
    from merlot_tpu.data._native.build import build as _build
    _build(verbose=False)
    from merlot_tpu.data._native._merlot_native import (  # noqa: F401
        crc32c, masked_crc, read_record_spans, scan_example)
