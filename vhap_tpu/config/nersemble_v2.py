"""NeRSemble v2 tracking configuration (vhap/config/nersemble_v2.py)."""

from __future__ import annotations

from dataclasses import dataclass, field

from vhap_tpu.config.nersemble import NersembleDataConfig, NersembleTrackingConfig


@dataclass
class NersembleV2DataConfig(NersembleDataConfig):
    _target: str = "vhap_tpu.data.nersemble_v2_dataset.NeRSembleV2Dataset"


@dataclass
class NersembleV2TrackingConfig(NersembleTrackingConfig):
    data: NersembleV2DataConfig = field(default_factory=NersembleV2DataConfig)
