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


def vision_interactive_chat(runner, max_tokens: int = 512) -> None:
    """Vision REPL (ref interactive_mode.rs vision mode / main.rs --vi):
    `\\image <path>` attaches an image to the next message."""
    print("mistralrs-tpu vision chat. '\\image <path>' attaches an image; "
          "Ctrl-D or 'exit' to quit.")
    history: list[dict] = []
    pending_images: list[str] = []
    while True:
        try:
            user = input("> ")
        except EOFError:
            print()
            return
        stripped = user.strip()
        if stripped in ("exit", "quit"):
            return
        if not stripped:
            continue
        if stripped.startswith("\\image "):
            pending_images.append(stripped[len("\\image "):].strip())
            print(f"[{len(pending_images)} image(s) attached]")
            continue
        # extract_images replaces each image part with the model's image
        # token, so the text part stays tag-free
        content: list[dict] = [
            {"type": "image_url", "image_url": {"url": im}}
            for im in pending_images
        ]
        content.append({"type": "text", "text": user})
        pending_images = []
        history.append({"role": "user", "content": content})
        try:
            resp = runner.send_chat_completion_request(
                history, SamplingParams(temperature=0.7, top_p=0.9,
                                        max_len=max_tokens))
        except Exception as e:  # bad image path/payload: keep the session
            history.pop()
            print(f"[error] {e}")
            continue
        text = resp.choices[0].text
        print(text)
        history.append({"role": "assistant", "content": text})
