"""Host utilities: tokenizer loading, logging, memory accounting.

Reference parity: mistralrs-core/src/utils/ (tokenizer.rs, memory_usage.rs,
debug.rs) and pipeline/chat_template.rs.
"""
