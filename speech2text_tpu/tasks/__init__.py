"""Task layer: one task class per system (reference task_factory parity).

TaskFactory keys (reference build_task.py:37-45):
  CTC, Rnnt, CTC_Hybrid_Rnnt, Pruned_Rnnt, SSL, CIF, NNLM
"""

from __future__ import annotations


def TaskFactory(task_type: str):
    if task_type == "CTC":
        from .ctc import CtcTask
        return CtcTask
    if task_type == "Rnnt":
        from .rnnt import RnntTask
        return RnntTask
    if task_type == "CTC_Hybrid_Rnnt":
        from .rnnt import CtcHybridRnntTask
        return CtcHybridRnntTask
    if task_type == "Pruned_Rnnt":
        from .rnnt import PrunedRnntTask
        return PrunedRnntTask
    if task_type == "SSL":
        from .ssl import SslTask
        return SslTask
    if task_type == "CIF":
        from .cif import CifTask
        return CifTask
    if task_type == "NNLM":
        from .nnlm import NnLmTask
        return NnLmTask
    raise ValueError(f"unknown task type {task_type}")
