from mistralrs_tpu.grammar.regex import DenseDFA, compile_regex
from mistralrs_tpu.grammar.toktrie import TokTrie, vocab_bytes
from mistralrs_tpu.grammar.recognizer import Constraint, DfaRecognizer, make_recognizer

__all__ = [
    "Constraint",
    "DenseDFA",
    "DfaRecognizer",
    "TokTrie",
    "compile_regex",
    "make_recognizer",
    "vocab_bytes",
]
