"""Sort execution plans — the TPU equivalents of the reference's eight
algorithms (reference: src/sorts/, SURVEY.md §2.2).

Each plan is a function ``(words, payload_words, plan_info) -> (words,
payload_words)`` over uint32 word planes. Dispatch happens in
``rdst_tpu.sorter`` via the Tuner.
"""
from rdst_tpu.sorts.comparative import comparative_sort

__all__ = ["comparative_sort"]
