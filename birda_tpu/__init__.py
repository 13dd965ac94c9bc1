"""birda_tpu — TPU-native bioacoustic inference framework.

A from-scratch rebuild of the tphakala/birda batch bioacoustic CLI for TPU
hardware: audio decode/resample/segmentation feeding BirdNET/Perch classifier
graphs compiled with XLA (flax re-implementations + an ONNX weight importer),
geographic range filtering as a fused secondary head, BSG calibration, bat
two-stage classification, and six detection output formats.
"""

__version__ = "0.1.0"
