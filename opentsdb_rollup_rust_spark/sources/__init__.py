from .synth import synth_sequences  # noqa: F401
