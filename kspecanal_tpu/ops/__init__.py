from kspecanal_tpu.ops import dsp, spectrum  # noqa: F401
