"""birda_tpu — TPU-native bioacoustic inference framework.

A from-scratch rebuild of the tphakala/birda batch bioacoustic CLI for TPU
hardware: audio decode/resample/segmentation feeding BirdNET/Perch classifier
graphs compiled with XLA (flax re-implementations + an ONNX weight importer),
geographic range filtering as a fused secondary head, BSG calibration, bat
two-stage classification, and six detection output formats.
"""

__version__ = "0.1.0"

#: Lazy re-exports of the library API (birda_tpu.analyze and friends)
#: keep `import birda_tpu` light — the CLI and tests import subpackages
#: directly, and the API pulls in jax only when first called.
_API_NAMES = ("analyze", "species", "clip", "AnalyzeResult",
              "FileResult", "Detection", "SpeciesEntry")


def __getattr__(name):
    if name in _API_NAMES:
        from . import api

        return getattr(api, name)
    raise AttributeError(f"module 'birda_tpu' has no attribute '{name}'")


def __dir__():
    return sorted(list(globals()) + list(_API_NAMES))
