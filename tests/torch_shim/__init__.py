"""Torch-side shims that let the reference model files execute as oracles."""
