from .synth import generate_sequences, sequences_schema  # noqa: F401
