"""ddsp_svc_tpu — TPU-native DDSP singing-voice-conversion framework.

See README.md for the layout; SURVEY.md/PARITY.md map this package to the
reference it reimplements.
"""
__version__ = "0.1.0"
