"""Pure, deterministic kernels. No Ray imports here — unit-testable directly."""
