"""Host-analysis tools: firmware emulation.

Note: the reference ships this under ``host_analysis/`` *without* an
``__init__.py`` while two modules import it as
``audio_processing_tools.edge.device_dsd_processing_emulator`` — a broken
packaged-layout import (SURVEY §7 known defects).  Here the emulator is a
proper package and is additionally re-exported under the path importers
expect.
"""

from audio_processing_tools_tpu.host_analysis.dsd_emulator import (
    DsdProcessingEmulator,
    DsdProcessingEmualtor,  # reference-misspelling compat alias
)
from audio_processing_tools_tpu.host_analysis.dsd_device import (
    dsd_minutes_device,
    dsd_minutes_device_duty_cycled,
)

__all__ = [
    "DsdProcessingEmulator",
    "DsdProcessingEmualtor",
    "dsd_minutes_device",
    "dsd_minutes_device_duty_cycled",
]
