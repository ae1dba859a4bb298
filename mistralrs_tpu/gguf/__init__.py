"""GGUF model format support.

Reference parity: mistralrs-core/src/gguf/ — multi-file `Content` reader
(content.rs:42-177), GGUF->HF tokenizer conversion (gguf_tokenizer.rs:75),
embedded chat-template extraction (chat_template.rs:27), plus the candle
k-quant block formats consumed by mistralrs-quant.

Here: a numpy/mmap reader (reader.py), numpy reference dequantization for
every ggml quant type we serve (quant/kquants.py holds the bit layouts), and
tokenizer/chat-template conversion (tokenizer.py).
"""

from mistralrs_tpu.gguf.reader import GGUFFile, GGMLType
