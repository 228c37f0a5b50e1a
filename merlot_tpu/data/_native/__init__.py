"""Native (C++) data-path kernels with transparent build-or-fallback.

Importing this package exposes crc32c / masked_crc / read_record_spans /
scan_example (and decode_jpeg when libjpeg is available) from the compiled
extension. The extension is (re)built on import whenever native.cc is newer
than the .so (g++, ~1s); on any failure the import raises and callers fall
back to the pure-python implementations in merlot_tpu.data.tfrecord.
"""

import glob as _glob
import os as _os


def _needs_build() -> bool:
    here = _os.path.dirname(_os.path.abspath(__file__))
    sos = _glob.glob(_os.path.join(here, "_merlot_native*.so"))
    if not sos:
        return True
    src = _os.path.join(here, "native.cc")
    return _os.path.getmtime(src) > max(_os.path.getmtime(s) for s in sos)


if _needs_build():
    from merlot_tpu.data._native.build import build as _build
    _build(verbose=False)

try:
    from merlot_tpu.data._native._merlot_native import (  # noqa: F401
        crc32c, masked_crc, read_record_spans, scan_example)
except ImportError:
    # a stale .so can satisfy the mtime check yet fail to import (Python
    # ABI change leaves an old cpython-tagged .so newer than native.cc) —
    # rebuild once and retry before giving up to the pure-python fallback
    from merlot_tpu.data._native.build import build as _build2
    _build2(verbose=False)
    from merlot_tpu.data._native._merlot_native import (  # noqa: F401, E402
        crc32c, masked_crc, read_record_spans, scan_example)
