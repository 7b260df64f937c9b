"""Leveled debug printing (reference: src/tools/MrHyDE_Debugger.cpp:25-58).

In the reference only rank 0 prints; here only jax process 0 prints.
"""

from __future__ import annotations

__all__ = ["Debugger"]


class Debugger:
    def __init__(self, debug_level: int = 0):
        self.level = int(debug_level)

    def _is_lead(self) -> bool:
        try:
            import jax
            return jax.process_index() == 0
        except Exception:
            return True

    def print(self, threshold: int, message: str):
        if self.level >= threshold and self._is_lead():
            print(message, flush=True)
