"""Host-side data plane: containers, codecs, storage, normalization.

Devices do math; hosts do I/O.  Everything here is NumPy/stdlib Python that
feeds the device pipeline.  Cloud backends (S3 via boto3, Postgres via
SQLAlchemy) are import-gated: the modules load without those packages and
raise a clear error only when actually used.
"""

from audio_processing_tools_tpu.io.mark import (
    parse_mark_audio_file,
    write_mark_audio_file,
    parse_mark_header,
    MARK_MAGIC,
    HEADER_SIZE,
)
from audio_processing_tools_tpu.io.audio import (
    safe_to_float,
    ensure_mono_len_sr,
    pcm_to_float,
    get_keys,
    get_input_data,
)

__all__ = [
    "parse_mark_audio_file",
    "write_mark_audio_file",
    "parse_mark_header",
    "MARK_MAGIC",
    "HEADER_SIZE",
    "safe_to_float",
    "ensure_mono_len_sr",
    "pcm_to_float",
    "get_keys",
    "get_input_data",
]
