"""Interactive terminal chat.

Reference parity: mistralrs-server/src/interactive_mode.rs (:29-200) —
REPL chat with streaming output and history.
"""

from __future__ import annotations

from mistralrs_tpu.engine.sampler import SamplingParams


def interactive_chat(runner, max_tokens: int = 512) -> None:
    print("mistralrs-tpu interactive chat. Ctrl-D or 'exit' to quit.")
    history: list[dict] = []
    while True:
        try:
            user = input("> ")
        except EOFError:
            print()
            return
        if user.strip() in ("exit", "quit"):
            return
        if not user.strip():
            continue
        history.append({"role": "user", "content": user})
        parts: list[str] = []
        for delta, reason in runner.stream_chat_completion_request(
            history, SamplingParams(temperature=0.7, top_p=0.9, max_len=max_tokens)
        ):
            print(delta, end="", flush=True)
            parts.append(delta)
        print()
        history.append({"role": "assistant", "content": "".join(parts)})
