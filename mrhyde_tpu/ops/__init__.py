"""TPU kernel ops (Pallas) for the hot assembly paths."""
