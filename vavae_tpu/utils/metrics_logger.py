"""Training-metrics sinks: TensorBoard scalars + JSONL fallback.

Parity target: the reference logs scalars + config text to TensorBoard
(LightningDiT/train.py:59-65,233) and rank0-only python logging. Here a
single ``MetricsLogger`` writes TB events when tensorboard is importable and
always appends machine-readable JSONL (survives environments without TB).
Process-0 only, matching the reference's rank0 gating.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: str, enabled: Optional[bool] = None):
        import jax

        self.enabled = enabled if enabled is not None else jax.process_index() == 0
        self.log_dir = log_dir
        self._tb = None
        self._jsonl = None
        if not self.enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        if not self.enabled:
            return
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            v = float(v)
            rec[k] = v
            if self._tb is not None:
                self._tb.add_scalar(k, v, step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def log_text(self, tag: str, text: str, step: int = 0) -> None:
        if self.enabled and self._tb is not None:
            self._tb.add_text(tag, text, step)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
