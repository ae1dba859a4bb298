"""Python user API.

Reference parity: mistralrs-pyo3 `Runner` (lib.rs:303-954) — the synchronous
Python entry point that loads a model, owns the engine thread, and exposes
chat/completion calls (blocking or streaming iterator), plus the
MistralRs-style thread-owning handle (mistralrs-core/src/lib.rs:100-454):
one engine thread, bounded request queue, engine reboot on death.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import uuid
from typing import Any, Iterator

from mistralrs_tpu.engine.engine import Engine, GenerationRequest
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.engine.sequence import SequenceGroup
from mistralrs_tpu.pipeline.chat_template import apply_chat_template, flatten_text_content


@dataclasses.dataclass
class ChatChoice:
    index: int
    text: str
    finish_reason: str


@dataclasses.dataclass
class ChatResponse:
    id: str
    choices: list[ChatChoice]
    usage: Any


class EngineHandle:
    """Thread-owning engine handle (ref MistralRs lib.rs:299-317: the engine
    lives on its own thread; callers talk through a bounded queue)."""

    def __init__(self, engine: Engine, queue_size: int = 10_000):
        self.engine = engine
        self._requests: queue.Queue = queue.Queue(maxsize=queue_size)
        # control ops (re-ISQ, adapter swap) run ON the engine thread
        # between steps — they mutate pipeline params, which would race a
        # concurrent step if run from the HTTP thread (ref Request::ReIsq /
        # ActivateAdapters are engine-loop messages, engine/mod.rs:434)
        self._controls: queue.Queue = queue.Queue()
        self._shutdown = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True, name="engine")
        self._thread.start()

    def _drain_controls(self) -> None:
        try:
            while True:
                fn, box, done_evt = self._controls.get_nowait()
                try:
                    box.append(fn())
                except Exception as e:  # noqa: BLE001
                    box.append(e)
                done_evt.set()
        except queue.Empty:
            pass

    def run_control(self, fn):
        """Run fn() on the engine thread between steps; returns its result
        (re-raising its exception here on the calling thread)."""
        if not self._thread.is_alive() and not self._shutdown.is_set():
            self._thread = threading.Thread(target=self._run, daemon=True,
                                            name="engine")
            self._thread.start()
        evt = threading.Event()
        box: list = []
        self._controls.put((fn, box, evt))
        evt.wait()
        if box and isinstance(box[0], Exception):
            raise box[0]
        return box[0] if box else None

    def _run(self) -> None:
        while not self._shutdown.is_set():
            self._drain_controls()
            # drain incoming requests without blocking the step loop
            try:
                while True:
                    req, done_evt = self._requests.get_nowait()
                    self.engine.add_request(req)
                    done_evt.set()
            except queue.Empty:
                pass
            if self.engine.has_work:
                try:
                    self.engine.step()
                except Exception as e:
                    # last-resort guard for non-forward errors (scheduler/host
                    # bugs); forward errors are handled inside Engine.step
                    # (ref handle_pipeline_forward_error!). Route through
                    # _fail_batch + _finish_done so KV pages are freed.
                    self.engine._fail_batch(list(self.engine.scheduler.running), e)
                    self.engine._finish_done()
            else:
                # idle: block briefly for the next request
                try:
                    req, done_evt = self._requests.get(timeout=0.05)
                    self.engine.add_request(req)
                    done_evt.set()
                except queue.Empty:
                    pass

    def submit(self, req: GenerationRequest) -> SequenceGroup:
        # engine reboot on dead thread (ref lib.rs:333-397 RebootState: the
        # engine state survives; only the serving thread is restarted)
        if not self._thread.is_alive() and not self._shutdown.is_set():
            self._thread = threading.Thread(target=self._run, daemon=True,
                                            name="engine")
            self._thread.start()
        evt = threading.Event()
        self._requests.put((req, evt))
        evt.wait()
        return self.engine._groups[req.request_id]

    def shutdown(self) -> None:
        self._shutdown.set()
        self._thread.join(timeout=5)


class Runner:
    """High-level blocking API (ref mistralrs-pyo3 Runner)."""

    def __init__(self, model_path: str, *, dtype: Any = None, isq: str | None = None,
                 topology: str | None = None, pipeline_config: Any = None, mesh: Any = None,
                 adapters: list[str] | None = None, ordering: str | None = None,
                 xlora_path: str | None = None, token_source: str = "cache",
                 prompt_lookup_gamma: int | None = None,
                 truncate_sequence: bool = True,
                 prefix_cache: bool = True,
                 prefix_cache_pages: int | None = None):
        """adapters: PEFT adapter dirs to preload (LoRA); ordering: JSON
        ordering file fixing adapter stack order (ref lora/mod.rs Ordering);
        xlora_path: X-LoRA dir with xlora_config.json + classifier weights;
        token_source: hub auth source string (ref --token-source,
        utils/hub.py parse_token_source)."""
        import jax.numpy as jnp

        from mistralrs_tpu.models.loader import load_hf_model
        from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline
        from mistralrs_tpu.utils.hub import resolve_model_path
        from mistralrs_tpu.utils.tokenizer import TokenizerWrapper

        dtype = dtype or jnp.bfloat16
        # HF model ids download via the hub; local dirs pass through
        # (ref get_paths! / load_model_from_hf, utils/hub.py)
        model_path = resolve_model_path(model_path, token_source=token_source)
        cfg, params, rope = load_hf_model(model_path, dtype=dtype, isq=isq, topology=topology)
        self.tokenizer = TokenizerWrapper.from_hf_dir(model_path)
        pc = pipeline_config or PipelineConfig()
        self.adapter_names: list[str] = []
        if adapters:
            from mistralrs_tpu.lora import (
                Ordering, apply_lora_to_params, load_peft_adapter,
            )

            ads = [load_peft_adapter(p) for p in adapters]
            if ordering:
                ads = Ordering.from_file(ordering).sort_adapters(ads)
            params = apply_lora_to_params(params, cfg, ads, dtype=dtype)
            self.adapter_names = [a.name for a in ads]
        if xlora_path is not None:
            import os

            from mistralrs_tpu.lora.xlora import (
                XLoraConfig, XLoraPipeline, classifier_from_safetensors,
            )

            xcfg = XLoraConfig.from_json_file(os.path.join(xlora_path, "xlora_config.json"))
            clf = classifier_from_safetensors(
                os.path.join(xlora_path, "xlora_classifier.safetensors"), dtype=dtype
            )
            pipe = XLoraPipeline(cfg, params, rope, pc, classifier=clf, xcfg=xcfg,
                                 n_adapters=len(self.adapter_names), mesh=mesh)
        else:
            pipe = TextPipeline(cfg, params, rope, pc, mesh=mesh)
        if prompt_lookup_gamma:
            # draftless n-gram speculative decoding (pipeline/speculative.py)
            from mistralrs_tpu.pipeline.speculative import PromptLookupPipeline

            pipe = PromptLookupPipeline(pipe, gamma=prompt_lookup_gamma)
        engine = Engine(
            pipe,
            eos_token_ids=self.tokenizer.eos_token_ids,
            detokenizer=self.tokenizer.detokenizer(),
            grammar_vocab=self.tokenizer.grammar_vocab(),
            truncate_sequence=truncate_sequence,
            prefix_cache=prefix_cache,
            prefix_cache_pages=prefix_cache_pages,
        )
        self.handle = EngineHandle(engine)
        self.cfg = cfg

    def send_re_isq(self, dtype: str) -> None:
        """Runtime re-quantization (ref pyo3 Runner.send_re_isq lib.rs:935):
        re-packs every linear to `dtype` (e.g. "Q4K", "Q8_0") on the engine
        thread; the next step recompiles against the new formats."""
        pipe = self.handle.engine.pipeline
        if not hasattr(pipe, "re_isq"):
            raise ValueError("this pipeline does not support re-ISQ")
        self.handle.run_control(lambda: pipe.re_isq(dtype))

    def activate_adapters(self, names: list[str]) -> None:
        """Runtime adapter swap — a data-only gates update, no recompile
        (ref /activate_adapters route + AdapterSwapper). Runs on the engine
        thread between steps like every params mutation."""
        from mistralrs_tpu.lora import activate_adapters as _act

        pipe = self.handle.engine.pipeline

        def _swap():
            pipe.params = _act(pipe.params, self.adapter_names, names)

        self.handle.run_control(_swap)

    @classmethod
    def from_engine(cls, engine: Engine, tokenizer) -> "Runner":
        self = object.__new__(cls)
        self.tokenizer = tokenizer
        self.handle = EngineHandle(engine)
        self.cfg = getattr(engine.pipeline, "cfg", None)
        return self

    @classmethod
    def from_parts(cls, cfg, params, rope, tokenizer, pc=None, mesh=None,
                   adapters: list[str] | None = None, ordering: str | None = None,
                   xlora_path: str | None = None, dtype=None,
                   prompt_lookup_gamma: int | None = None,
                   truncate_sequence: bool = True,
                   prefix_cache: bool = True,
                   prefix_cache_pages: int | None = None) -> "Runner":
        """Assemble from already-loaded pieces (GGUF/GGML path, tests).

        adapters/ordering/xlora_path mirror __init__ — LoRA and X-LoRA wrap
        quantized linears unmerged (ref xlora_models/quantized_llama.rs,
        gguf.rs:59-66 XLoraGGUF variants)."""
        import jax.numpy as jnp

        from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

        dtype = dtype or jnp.bfloat16
        pc = pc or PipelineConfig()
        names: list[str] = []
        if adapters:
            from mistralrs_tpu.lora import (
                Ordering, apply_lora_to_params, load_peft_adapter,
            )

            ads = [load_peft_adapter(p) for p in adapters]
            if ordering:
                ads = Ordering.from_file(ordering).sort_adapters(ads)
            params = apply_lora_to_params(params, cfg, ads, dtype=dtype)
            names = [a.name for a in ads]
        if xlora_path is not None:
            import os

            from mistralrs_tpu.lora.xlora import (
                XLoraConfig, XLoraPipeline, classifier_from_safetensors,
            )

            xcfg = XLoraConfig.from_json_file(
                os.path.join(xlora_path, "xlora_config.json"))
            clf = classifier_from_safetensors(
                os.path.join(xlora_path, "xlora_classifier.safetensors"),
                dtype=dtype)
            pipe = XLoraPipeline(cfg, params, rope, pc, classifier=clf,
                                 xcfg=xcfg, n_adapters=len(names), mesh=mesh)
        else:
            pipe = TextPipeline(cfg, params, rope, pc, mesh=mesh)
        if prompt_lookup_gamma:
            from mistralrs_tpu.pipeline.speculative import PromptLookupPipeline

            pipe = PromptLookupPipeline(pipe, gamma=prompt_lookup_gamma)
        engine = Engine(
            pipe,
            eos_token_ids=tokenizer.eos_token_ids if tokenizer else set(),
            detokenizer=tokenizer.detokenizer() if tokenizer else None,
            grammar_vocab=tokenizer.grammar_vocab() if tokenizer else None,
            truncate_sequence=truncate_sequence,
            prefix_cache=prefix_cache,
            prefix_cache_pages=prefix_cache_pages,
        )
        self = cls.from_engine(engine, tokenizer)
        self.adapter_names = names
        return self

    # ------------------------------------------------------------- chat
    def _prompt_from_messages(self, messages: list[dict[str, Any]]) -> list[int]:
        template = self.tokenizer.chat_template
        if template is None:
            text = "\n".join(f"{m['role']}: {m['content']}" for m in messages) + "\nassistant:"
        else:
            text = apply_chat_template(
                template,
                flatten_text_content(messages),
                add_generation_prompt=True,
                bos_token=self.tokenizer.bos_token,
                eos_token=self.tokenizer.eos_token,
            )
        return self.tokenizer.encode(text)

    def send_chat_completion_request(
        self,
        messages: list[dict[str, Any]],
        sampling: SamplingParams | None = None,
        constraint: Any | None = None,
    ) -> ChatResponse:
        toks = self._prompt_from_messages(messages)
        return self._complete(toks, sampling or SamplingParams(), constraint)

    def send_completion_request(
        self, prompt: str, sampling: SamplingParams | None = None,
        constraint: Any | None = None,
    ) -> ChatResponse:
        toks = self.tokenizer.encode(prompt)
        return self._complete(toks, sampling or SamplingParams(), constraint)

    def stream_chat_completion_request(
        self, messages: list[dict[str, Any]], sampling: SamplingParams | None = None
    ) -> Iterator[tuple[str, str | None]]:
        """Yields (delta_text, finish_reason_or_None)."""
        toks = self._prompt_from_messages(messages)
        q: queue.Queue = queue.Queue()
        rid = f"chatcmpl-{uuid.uuid4().hex[:20]}"
        req = GenerationRequest(
            toks, sampling or SamplingParams(), request_id=rid,
            stream=lambda seq, delta, reason: q.put((delta, reason)),
        )
        self.handle.submit(req)
        while True:
            delta, reason = q.get()
            yield delta, reason
            if reason is not None:
                return

    def _complete(self, toks: list[int], sampling: SamplingParams,
                  constraint: Any | None = None) -> ChatResponse:
        rid = f"chatcmpl-{uuid.uuid4().hex[:20]}"
        group = self.handle.submit(
            GenerationRequest(toks, sampling, request_id=rid, constraint=constraint)
        )
        import time

        while not group.all_done():
            time.sleep(0.002)
        choices = [
            ChatChoice(i, s.final_text(), s.stop_reason.value if s.stop_reason else "stop")
            for i, s in enumerate(group.seqs)
        ]
        return ChatResponse(id=rid, choices=choices, usage=group.usage())

    def shutdown(self) -> None:
        self.handle.shutdown()


class VisionRunner(Runner):
    """Vision-model Runner (ref pyo3 Which.VisionPlain + VisionChat request).

    arch: "llava" | "llava_next" | "idefics2" | "phi3v"."""

    def __init__(self, model_path: str, arch: str, *, dtype: Any = None,
                 pipeline_config: Any = None, mesh: Any = None,
                 truncate_sequence: bool = True, prefix_cache: bool = True,
                 prefix_cache_pages: int | None = None):
        import jax.numpy as jnp

        from mistralrs_tpu.pipeline.text import PipelineConfig
        from mistralrs_tpu.pipeline.vision import VisionPipeline
        from mistralrs_tpu.utils.tokenizer import TokenizerWrapper

        dtype = dtype or jnp.bfloat16
        self.tokenizer = TokenizerWrapper.from_hf_dir(model_path)
        pc = pipeline_config or PipelineConfig()
        self.adapter_names = []
        if arch in ("llava", "llava_next"):
            from mistralrs_tpu.vision.llava import load_llava, make_llava_encoder
            from mistralrs_tpu.vision.processor import LlavaNextProcessor, LlavaProcessor

            cfg, params, rope, vision, hf = load_llava(model_path, dtype=dtype)
            img_tok = hf.get("image_token_index", hf.get("image_token_id"))
            encode = make_llava_encoder(vision, llava_next=(arch == "llava_next"))
            if arch == "llava_next":
                self.processor = LlavaNextProcessor(self.tokenizer, img_tok, vision)
            else:
                self.processor = LlavaProcessor(
                    self.tokenizer, img_tok, vision.vcfg.image_size,
                    vision.vcfg.patch_size,
                )
        elif arch == "idefics2":
            from mistralrs_tpu.vision.idefics2 import load_idefics2, make_idefics2_encoder
            from mistralrs_tpu.vision.processor import Idefics2Processor

            cfg, params, rope, vision, hf = load_idefics2(model_path, dtype=dtype)
            img_tok = hf.get("image_token_id", hf.get("image_token_index"))
            encode = make_idefics2_encoder(vision)
            self.processor = Idefics2Processor(
                self.tokenizer, img_tok,
                hf["perceiver_config"].get("resampler_n_latents", 64),
                image_size=vision.vcfg.image_size,
            )
        elif arch == "phi3v":
            from mistralrs_tpu.vision.phi3v import (
                Phi3VProcessor, load_phi3v, make_phi3v_encoder,
            )

            cfg, params, rope, vision, hf = load_phi3v(model_path, dtype=dtype)
            img_tok = hf.get("image_token_id", 32038)  # phi3v placeholder id
            encode = make_phi3v_encoder(vision)
            self.processor = Phi3VProcessor(self.tokenizer, img_tok)
        else:
            raise ValueError(f"unknown vision arch {arch!r}")
        pipe = VisionPipeline(cfg, params, rope, pc, image_token_id=img_tok,
                              encode_images=encode, mesh=mesh)
        engine = Engine(
            pipe,
            eos_token_ids=self.tokenizer.eos_token_ids,
            detokenizer=self.tokenizer.detokenizer(),
            grammar_vocab=self.tokenizer.grammar_vocab(),
            truncate_sequence=truncate_sequence,
            prefix_cache=prefix_cache,
            prefix_cache_pages=prefix_cache_pages,
        )
        self.handle = EngineHandle(engine)
        self.cfg = cfg

    def send_chat_completion_request(
        self,
        messages: list[dict[str, Any]],
        sampling: SamplingParams | None = None,
        constraint: Any | None = None,
    ) -> ChatResponse:
        """Messages may carry OpenAI image_url content parts (base64/data
        URLs) — the VisionChat path (ref request.rs RequestMessage::VisionChat)."""
        text, images = extract_images(messages, self.processor.image_token)
        toks, pixel = self.processor(text, images)
        rid = f"chatcmpl-{uuid.uuid4().hex[:20]}"
        group = self.handle.submit(GenerationRequest(
            toks, sampling or SamplingParams(), request_id=rid,
            constraint=constraint, images=pixel,
        ))
        import time

        while not group.all_done():
            time.sleep(0.002)
        choices = [
            ChatChoice(i, s.final_text(), s.stop_reason.value if s.stop_reason else "stop")
            for i, s in enumerate(group.seqs)
        ]
        return ChatResponse(id=rid, choices=choices, usage=group.usage())


def extract_images(messages: list[dict[str, Any]], image_token: str = "<image>"):
    """Flatten chat messages to text, replacing image content parts with the
    image placeholder; returns (text, images) (ref chat_completion.rs
    parse_request image handling :153-338)."""
    texts = []
    images: list[Any] = []
    for m in messages:
        content = m.get("content")
        if isinstance(content, str):
            texts.append(f"{m['role']}: {content}")
            continue
        parts = []
        for item in content or []:
            if item.get("type") in ("image_url", "image"):
                url = item.get("image_url")
                if isinstance(url, dict):
                    url = url.get("url")
                images.append(url if url is not None else item.get("image"))
                parts.append(image_token)
            else:
                parts.append(item.get("text", ""))
        texts.append(f"{m['role']}: {''.join(parts)}")
    return "\n".join(texts) + "\nassistant:", images
