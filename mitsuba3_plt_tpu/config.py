"""Render-mode configuration (the TPU-native analog of Mitsuba's compiled
variants, resources/mitsuba.conf.template:86-382).

A `RenderConfig` is a small hashable static dataclass passed through jit:
  - rgb            : C = 3 fixed RGB channels
  - spectral       : C = 4 hero wavelengths, sampled per ray
  - polarized      : radiance becomes a Stokes 4-vector; BSDF values become
                     4x4 Mueller matrices, stored [..., 4, 4, C]

Array shape conventions:
  unpolarized spectrum: [N, C]
  Stokes vector:        [N, 4, C]
  Mueller matrix:       [N, 4, 4, C]
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    polarized: bool = False
    spectral: bool = False

    @property
    def n_channels(self) -> int:
        return 4 if self.spectral else 3

    @property
    def name(self) -> str:
        base = "spectral" if self.spectral else "rgb"
        return base + ("_polarized" if self.polarized else "")


RGB = RenderConfig(polarized=False, spectral=False)
RGB_POLARIZED = RenderConfig(polarized=True, spectral=False)
SPECTRAL = RenderConfig(polarized=False, spectral=True)
SPECTRAL_POLARIZED = RenderConfig(polarized=True, spectral=True)

VARIANTS = {
    "rgb": RGB,
    "rgb_polarized": RGB_POLARIZED,
    "spectral": SPECTRAL,
    "spectral_polarized": SPECTRAL_POLARIZED,
}
