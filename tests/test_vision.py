"""Vision tests: transforms vs HF image processors, ViT vs HF CLIP/SigLIP,
llava / llava-next end-to-end logits + generate parity vs transformers."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch
import transformers as tf
from PIL import Image

from mistralrs_tpu.vision import transforms as T
from mistralrs_tpu.vision.vit import VisionConfig, vision_params_from_hf, vit_forward


def _rand_image(rng, h=48, w=64):
    arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    return Image.fromarray(arr)


# ---------------------------------------------------------------- transforms
def test_normalize_rescale_pad_mask():
    rng = np.random.default_rng(0)
    img = _rand_image(rng)
    x = T.to_tensor(img)
    assert x.shape == (3, 48, 64) and 0 <= x.min() and x.max() <= 1
    n = T.normalize(x, [0.5, 0.5, 0.5], [0.2, 0.2, 0.2])
    np.testing.assert_allclose(n, (x - 0.5) / 0.2, rtol=1e-6)
    p = T.pad_to(x, 64, 64)
    assert p.shape == (3, 64, 64) and p[:, 50:, :].sum() == 0
    m = T.make_pixel_mask(p, 48, 64)
    assert m.sum() == 48 * 64


def test_resize_matches_hf_clip_processor():
    rng = np.random.default_rng(1)
    img = _rand_image(rng, 50, 70)
    proc = tf.CLIPImageProcessor(
        size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32},
        do_center_crop=True, do_resize=True, do_rescale=True, do_normalize=True,
        image_mean=[0.48, 0.46, 0.41], image_std=[0.27, 0.26, 0.28],
    )
    want = proc(img, return_tensors="np")["pixel_values"][0]
    # ours: shortest-edge resize + center crop + rescale + normalize
    h, w = T.get_resize_image_size(50, 70, 32)
    resized = T.interpolate_resize(img, (h, w))
    x = T.to_tensor(resized)
    top = (h - 32) // 2
    left = (w - 32) // 2
    x = x[:, top : top + 32, left : left + 32]
    got = T.normalize(x, [0.48, 0.46, 0.41], [0.27, 0.26, 0.28])
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=0)  # resampler tol


# ---------------------------------------------------------------- ViT parity
def _np_get(sd):
    return lambda name: sd[name].numpy() if name in sd else None


def test_vit_matches_hf_clip():
    torch.manual_seed(0)
    vc = tf.CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             image_size=32, patch_size=8)
    hfm = tf.CLIPVisionModel(vc).eval().float()
    cfg = VisionConfig.from_hf(vc.to_dict())
    params = vision_params_from_hf(_np_get(hfm.state_dict()), "vision_model.", cfg)
    rng = np.random.default_rng(2)
    px = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = hfm(torch.tensor(px), output_hidden_states=True)
    final, per_layer = vit_forward(params, cfg, jnp.asarray(px))
    np.testing.assert_allclose(
        np.asarray(final), want.last_hidden_state.numpy(), atol=2e-4, rtol=1e-3
    )
    for j in range(1, 3):
        np.testing.assert_allclose(
            np.asarray(per_layer[j - 1]), want.hidden_states[j].numpy(),
            atol=2e-4, rtol=1e-3,
        )


def test_vit_matches_hf_siglip():
    torch.manual_seed(1)
    vc = tf.SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                               num_hidden_layers=2, num_attention_heads=4,
                               image_size=32, patch_size=8)
    hfm = tf.SiglipVisionModel(vc).eval().float()
    cfg = VisionConfig.from_hf(vc.to_dict(), siglip=True)
    params = vision_params_from_hf(_np_get(hfm.state_dict()), "vision_model.", cfg)
    rng = np.random.default_rng(3)
    px = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = hfm(torch.tensor(px)).last_hidden_state.numpy()
    final, _ = vit_forward(params, cfg, jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(final), want, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------- llava e2e
IMG_TOK = 120


def _tiny_llava(next_=False, seed=0):
    torch.manual_seed(seed)
    vc = tf.CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             image_size=32, patch_size=8)
    tc = tf.LlamaConfig(hidden_size=48, intermediate_size=96, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
                        max_position_embeddings=256)
    if next_:
        cfg = tf.LlavaNextConfig(
            vision_config=vc.to_dict(), text_config=tc.to_dict(),
            image_token_index=IMG_TOK,
            image_grid_pinpoints=[[32, 64], [64, 32], [64, 64]],
        )
        hfm = tf.LlavaNextForConditionalGeneration(cfg).eval().float()
    else:
        cfg = tf.LlavaConfig(vision_config=vc.to_dict(), text_config=tc.to_dict(),
                             image_token_index=IMG_TOK)
        hfm = tf.LlavaForConditionalGeneration(cfg).eval().float()
    return cfg, hfm


def _our_llava(cfg, hfm, tmp_path, name):
    from safetensors.torch import save_file

    d = tmp_path / name
    d.mkdir()
    sd = hfm.state_dict()
    save_file({k: v.contiguous() for k, v in sd.items()}, str(d / "model.safetensors"))
    (d / "config.json").write_text(cfg.to_json_string())
    from mistralrs_tpu.vision.llava import load_llava

    return load_llava(str(d), dtype=jnp.float32)


def _pipe(text_cfg, params, rope, vision, image_token_id, llava_next=False):
    from mistralrs_tpu.pipeline.text import PipelineConfig
    from mistralrs_tpu.pipeline.vision import VisionPipeline
    from mistralrs_tpu.vision.llava import make_llava_encoder

    pc = PipelineConfig(page_size=4, num_pages=128, max_seqs=2, max_model_len=256,
                        prefill_buckets=(16, 32, 64), dtype=jnp.float32)
    return VisionPipeline(
        text_cfg, params, rope, pc,
        image_token_id=image_token_id,
        encode_images=make_llava_encoder(vision, llava_next=llava_next),
    )


def test_llava_generate_matches_hf(tmp_path):
    cfg, hfm = _tiny_llava()
    text_cfg, params, rope, vision, hf = _our_llava(cfg, hfm, tmp_path, "llava")
    pipe = _pipe(text_cfg, params, rope, vision, IMG_TOK)

    rng = np.random.default_rng(4)
    px = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    n_img_toks = 16  # (32/8)^2 after dropping CLS
    prompt = [3, 4] + [IMG_TOK] * n_img_toks + [5, 6, 7]
    with torch.no_grad():
        want = hfm.generate(
            input_ids=torch.tensor([prompt]), pixel_values=torch.tensor(px),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=8, do_sample=False,
        )[0, len(prompt):].tolist()

    from mistralrs_tpu.engine.engine import Engine, GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams

    eng = Engine(pipe, eos_token_ids=set())
    req = GenerationRequest(prompt, SamplingParams(max_len=8))
    g = eng.add_request(req)
    g.seqs[0].images = [{"pixel_values": px[0], "orig_hw": (32, 32)}]
    while eng.has_work:
        eng.step()
    assert g.seqs[0].generated_tokens == want


def test_llava_chunked_prefill_matches_one_shot(tmp_path):
    cfg, hfm = _tiny_llava(seed=1)
    text_cfg, params, rope, vision, hf = _our_llava(cfg, hfm, tmp_path, "llava2")
    rng = np.random.default_rng(5)
    px = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    # long prompt so the image span crosses a chunk boundary
    prompt = list(rng.integers(3, 100, size=10)) + [IMG_TOK] * 16 + \
        list(rng.integers(3, 100, size=9))

    from mistralrs_tpu.engine.engine import Engine, GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.pipeline.text import PipelineConfig
    from mistralrs_tpu.pipeline.vision import VisionPipeline
    from mistralrs_tpu.vision.llava import make_llava_encoder

    def run(buckets):
        pc = PipelineConfig(page_size=4, num_pages=128, max_seqs=2, max_model_len=256,
                            prefill_buckets=buckets, dtype=jnp.float32)
        pipe = VisionPipeline(text_cfg, params, rope, pc, image_token_id=IMG_TOK,
                              encode_images=make_llava_encoder(vision))
        eng = Engine(pipe, eos_token_ids=set())
        g = eng.add_request(GenerationRequest(list(prompt), SamplingParams(max_len=5)))
        g.seqs[0].images = [{"pixel_values": px[0], "orig_hw": (32, 32)}]
        while eng.has_work:
            eng.step()
        return g.seqs[0].generated_tokens

    assert run((16,)) == run((64,))  # 3 chunks vs 1 chunk


def test_llava_next_generate_matches_hf(tmp_path):
    cfg, hfm = _tiny_llava(next_=True, seed=2)
    text_cfg, params, rope, vision, hf = _our_llava(cfg, hfm, tmp_path, "llava_next")
    assert vision.grid_pinpoints and vision.image_newline is not None
    pipe = _pipe(text_cfg, params, rope, vision, IMG_TOK, llava_next=True)

    rng = np.random.default_rng(6)
    orig_hw = (40, 60)
    proc = tf.LlavaNextImageProcessor(
        size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32},
        image_grid_pinpoints=[[32, 64], [64, 32], [64, 64]],
    )
    img = Image.fromarray(rng.integers(0, 255, size=(*orig_hw, 3), dtype=np.uint8))
    out = proc(img, return_tensors="np")
    px = out["pixel_values"][0]  # [n_tiles, 3, 32, 32]
    image_sizes = out["image_sizes"]  # [[h, w]]

    # number of image tokens HF expects
    with torch.no_grad():
        n_img = int(hfm.model.get_image_features(
            pixel_values=torch.tensor(px[None]),
            image_sizes=torch.tensor(image_sizes),
            vision_feature_layer=cfg.vision_feature_layer,
            vision_feature_select_strategy=cfg.vision_feature_select_strategy,
        )[0].shape[0])
    prompt = [3, 4] + [IMG_TOK] * n_img + [5, 6]
    with torch.no_grad():
        want = hfm.generate(
            input_ids=torch.tensor([prompt]),
            pixel_values=torch.tensor(px[None]),
            image_sizes=torch.tensor(image_sizes),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=6, do_sample=False,
        )[0, len(prompt):].tolist()

    from mistralrs_tpu.engine.engine import Engine, GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams

    eng = Engine(pipe, eos_token_ids=set())
    g = eng.add_request(GenerationRequest(prompt, SamplingParams(max_len=6)))
    g.seqs[0].images = [{"pixel_values": px, "orig_hw": tuple(image_sizes[0])}]
    while eng.has_work:
        eng.step()
    assert g.seqs[0].generated_tokens == want


# ---------------------------------------------------------------- idefics2
def test_idefics2_generate_matches_hf(tmp_path):
    torch.manual_seed(7)
    from transformers import Idefics2Config, Idefics2ForConditionalGeneration

    cfg = Idefics2Config(
        image_token_id=121,
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=32, patch_size=8),
        perceiver_config=dict(resampler_depth=2, resampler_n_heads=4,
                              resampler_head_dim=8, resampler_n_latents=6,
                              num_key_value_heads=2),
        text_config=dict(model_type="mistral", hidden_size=48, intermediate_size=96,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, vocab_size=128,
                         max_position_embeddings=256, rms_norm_eps=1e-6),
    )
    hfm = Idefics2ForConditionalGeneration(cfg).eval().float()
    from safetensors.torch import save_file

    d = tmp_path / "idefics2"
    d.mkdir()
    save_file({k: v.contiguous() for k, v in hfm.state_dict().items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(cfg.to_json_string())

    from mistralrs_tpu.vision.idefics2 import load_idefics2, make_idefics2_encoder

    text_cfg, params, rope, vision, hf = load_idefics2(str(d), dtype=jnp.float32)

    rng = np.random.default_rng(8)
    px = rng.standard_normal((1, 1, 3, 32, 32)).astype(np.float32)  # [B, n_img, ...]
    n_lat = 6
    prompt = [3, 4] + [121] * n_lat + [5, 6]
    with torch.no_grad():
        want = hfm.generate(
            input_ids=torch.tensor([prompt]), pixel_values=torch.tensor(px),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=6, do_sample=False,
        )[0, len(prompt):].tolist()

    from mistralrs_tpu.engine.engine import Engine, GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.pipeline.text import PipelineConfig
    from mistralrs_tpu.pipeline.vision import VisionPipeline

    pc = PipelineConfig(page_size=4, num_pages=128, max_seqs=2, max_model_len=256,
                        prefill_buckets=(16, 32), dtype=jnp.float32)
    pipe = VisionPipeline(text_cfg, params, rope, pc, image_token_id=121,
                          encode_images=make_idefics2_encoder(vision))
    eng = Engine(pipe, eos_token_ids=set())
    g = eng.add_request(GenerationRequest(prompt, SamplingParams(max_len=6)))
    g.seqs[0].images = [{"pixel_values": px[0, 0], "orig_hw": (32, 32)}]
    while eng.has_work:
        eng.step()
    assert g.seqs[0].generated_tokens == want


# ------------------------------------------------------------- processors
def test_llava_processor_and_vision_runner(tmp_path):
    cfg, hfm = _tiny_llava(seed=3)
    from safetensors.torch import save_file

    d = tmp_path / "llava_full"
    d.mkdir()
    save_file({k: v.contiguous() for k, v in hfm.state_dict().items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(cfg.to_json_string())
    # word-level tokenizer artifacts
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {f"w{i}": i for i in range(128)}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="w0"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({}))

    from mistralrs_tpu.api import VisionRunner
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.pipeline.text import PipelineConfig

    pc = PipelineConfig(page_size=4, num_pages=128, max_seqs=2, max_model_len=256,
                        prefill_buckets=(16, 32, 64), dtype=jnp.float32)
    r = VisionRunner(str(d), "llava", dtype=jnp.float32, pipeline_config=pc)
    rng = np.random.default_rng(9)
    img = Image.fromarray(rng.integers(0, 255, size=(40, 50, 3), dtype=np.uint8))
    import base64, io

    buf = io.BytesIO()
    img.save(buf, format="PNG")
    data_url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    resp = r.send_chat_completion_request(
        [{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": data_url}},
            {"type": "text", "text": "w5 w6 w7"},
        ]}],
        SamplingParams(max_len=5),
    )
    assert resp.choices[0].text  # generated something
    r.shutdown()


def test_llava_next_processor_token_count_matches_features(tmp_path):
    cfg, hfm = _tiny_llava(next_=True, seed=4)
    text_cfg, params, rope, vision, hf = _our_llava(cfg, hfm, tmp_path, "lnp")
    from mistralrs_tpu.vision.llava import make_llava_encoder
    from mistralrs_tpu.vision.processor import LlavaNextProcessor

    class FakeTok:
        def encode(self, s, add_special_tokens=True):
            return [1] * len(s.split())

    proc = LlavaNextProcessor(FakeTok(), IMG_TOK, vision)
    rng = np.random.default_rng(10)
    img = Image.fromarray(rng.integers(0, 255, size=(40, 60, 3), dtype=np.uint8))
    ids, pixel = proc("a b <image> c", [img])
    n_tok = sum(1 for t in ids if t == IMG_TOK)
    # actual features produced must match the token count
    class S: pass
    s = S(); s.images = pixel
    feats = make_llava_encoder(vision, llava_next=True)(s)
    assert feats.shape[0] == n_tok


# ---------------------------------------------------------------- phi3v
def _tiny_phi3v_ckpt(tmp_path):
    """Synthetic Phi-3-vision checkpoint: tiny CLIP tower + tiny phi3 text,
    using the real key layout (model.vision_embed_tokens.*, fused qkv)."""
    import torch
    from safetensors.torch import save_file

    torch.manual_seed(11)
    E_txt, I_txt, L_txt, heads, kv = 48, 96, 2, 4, 2
    vc = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
              num_attention_heads=4, image_size=336, patch_size=56)  # 6x6 grid... 
    # 336/56 = 6 patches per side -> 36+1 tokens; HD pooling needs 24 -> keep
    # the real 14-patch geometry but a small channel dim instead:
    vc = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
              num_attention_heads=4, image_size=336, patch_size=14)
    C = vc["hidden_size"]
    sd = {}
    vp = "model.vision_embed_tokens."
    vm = vp + "img_processor.vision_model."
    def t(*shape):
        return torch.randn(*shape) * 0.05
    sd[vm + "embeddings.patch_embedding.weight"] = t(C, 3, 14, 14)
    sd[vm + "embeddings.class_embedding"] = t(C)
    sd[vm + "embeddings.position_embedding.weight"] = t(577, C)
    sd[vm + "pre_layrnorm.weight"] = torch.ones(C)
    sd[vm + "pre_layrnorm.bias"] = torch.zeros(C)
    sd[vm + "post_layernorm.weight"] = torch.ones(C)
    sd[vm + "post_layernorm.bias"] = torch.zeros(C)
    for i in range(vc["num_hidden_layers"]):
        lp = vm + f"encoder.layers.{i}."
        for nm, shp in (("self_attn.q_proj", (C, C)), ("self_attn.k_proj", (C, C)),
                        ("self_attn.v_proj", (C, C)), ("self_attn.out_proj", (C, C)),
                        ("mlp.fc1", (64, C)), ("mlp.fc2", (C, 64))):
            sd[lp + nm + ".weight"] = t(*shp)
            sd[lp + nm + ".bias"] = torch.zeros(shp[0])
        for nm in ("layer_norm1", "layer_norm2"):
            sd[lp + nm + ".weight"] = torch.ones(C)
            sd[lp + nm + ".bias"] = torch.zeros(C)
    sd[vp + "glb_GN"] = t(1, 1, 4 * C)
    sd[vp + "sub_GN"] = t(1, 1, 1, 4 * C)
    sd[vp + "img_projection.0.weight"] = t(E_txt, 4 * C)
    sd[vp + "img_projection.0.bias"] = torch.zeros(E_txt)
    sd[vp + "img_projection.2.weight"] = t(E_txt, E_txt)
    sd[vp + "img_projection.2.bias"] = torch.zeros(E_txt)
    # phi3 text (fused qkv / gate_up)
    sd["model.embed_tokens.weight"] = t(128, E_txt)
    sd["model.norm.weight"] = torch.ones(E_txt)
    sd["lm_head.weight"] = t(128, E_txt)
    hd = E_txt // heads
    for i in range(L_txt):
        lp = f"model.layers.{i}."
        sd[lp + "self_attn.qkv_proj.weight"] = t(E_txt + 2 * kv * hd, E_txt)
        sd[lp + "self_attn.o_proj.weight"] = t(E_txt, E_txt)
        sd[lp + "mlp.gate_up_proj.weight"] = t(2 * I_txt, E_txt)
        sd[lp + "mlp.down_proj.weight"] = t(E_txt, I_txt)
        sd[lp + "input_layernorm.weight"] = torch.ones(E_txt)
        sd[lp + "post_attention_layernorm.weight"] = torch.ones(E_txt)
    d = tmp_path / "phi3v"
    d.mkdir()
    save_file({k: v.contiguous() for k, v in sd.items()}, str(d / "model.safetensors"))
    cfg = {
        "architectures": ["Phi3VForCausalLM"], "model_type": "phi3_v",
        "hidden_size": E_txt, "intermediate_size": I_txt,
        "num_hidden_layers": L_txt, "num_attention_heads": heads,
        "num_key_value_heads": kv, "vocab_size": 128,
        "max_position_embeddings": 2048, "rms_norm_eps": 1e-5,
        "embd_layer": {"hd_transform_order": "sub_glb", "use_hd_transform": True},
        "img_processor": {"layer_idx": -2, "type_feature": "patch",
                          "vision_config": dict(vc)},
    }
    (d / "config.json").write_text(json.dumps(cfg))
    return str(d)


def test_phi3v_end_to_end(tmp_path):
    from mistralrs_tpu.vision.phi3v import (
        Phi3VProcessor, load_phi3v, make_phi3v_encoder, num_img_tokens,
    )

    path = _tiny_phi3v_ckpt(tmp_path)
    text_cfg, params, rope, vision, hf = load_phi3v(path, dtype=jnp.float32)
    assert vision.hd_order == "sub_glb"

    class FakeTok:
        def encode(self, s, add_special_tokens=True):
            return [1] * len(s.split())

    proc = Phi3VProcessor(FakeTok(), image_token_id=120, num_crops=4)
    rng = np.random.default_rng(12)
    img = Image.fromarray(rng.integers(0, 255, size=(200, 400, 3), dtype=np.uint8))
    ids, pixel = proc("a b <|image|> c", [img])
    n_tok = sum(1 for t in ids if t == 120)
    assert n_tok == num_img_tokens(pixel[0]["orig_hw"])
    # encoder produces exactly that many feature rows
    class S: pass
    s = S(); s.images = pixel
    feats = make_phi3v_encoder(vision)(s)
    assert feats.shape == (n_tok, text_cfg.hidden_size)

    # engine e2e: chunked prefill vs one-shot identical
    from mistralrs_tpu.engine.engine import Engine, GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.pipeline.text import PipelineConfig
    from mistralrs_tpu.pipeline.vision import VisionPipeline

    def run(buckets):
        pc = PipelineConfig(page_size=16, num_pages=128, max_seqs=2,
                            max_model_len=2048, prefill_buckets=buckets,
                            dtype=jnp.float32)
        pipe = VisionPipeline(text_cfg, params, rope, pc, image_token_id=120,
                              encode_images=make_phi3v_encoder(vision))
        eng = Engine(pipe, eos_token_ids=set())
        g = eng.add_request(GenerationRequest(list(ids), SamplingParams(max_len=4)))
        g.seqs[0].images = pixel
        while eng.has_work:
            eng.step()
        return g.seqs[0].generated_tokens

    a = run((256, 1024))
    b = run((1024,))
    assert a == b and len(a) == 4


def test_idefics2_image_splitting_processor():
    from mistralrs_tpu.vision.processor import Idefics2Processor

    class FakeTok:
        def encode(self, s, add_special_tokens=True):
            return [1] * len(s.split())

    proc = Idefics2Processor(FakeTok(), image_token_id=121, n_latents=6,
                             image_size=32, do_image_splitting=True)
    rng = np.random.default_rng(13)
    img = Image.fromarray(rng.integers(0, 255, size=(40, 60, 3), dtype=np.uint8))
    ids, pixel = proc("a <image> b", [img])
    assert sum(1 for t in ids if t == 121) == 6 * 5
    assert pixel[0]["pixel_values"].shape == (5, 3, 32, 32)


def test_phi3v_torch_oracle_parity(tmp_path):
    """Close the phi3v parity question (no phi3_v in transformers, so no
    direct HF generate): an INDEPENDENT torch oracle — HF CLIPVisionModel on
    the same weights, HD feature reassembly + separators + projection
    reimplemented from the HF Phi-3-vision algorithm (= ref phi3.rs
    ImageEmbedding :642-800), spliced into HF Phi3ForCausalLM.generate via
    inputs_embeds using the REFERENCE'S negative-id convention. Greedy
    tokens must match the engine exactly, proving the positive-placeholder
    deviation is position- and feature-exact."""
    import torch
    import torch.nn.functional as F
    from transformers import CLIPVisionConfig, CLIPVisionModel, Phi3Config, Phi3ForCausalLM
    from safetensors import safe_open

    from mistralrs_tpu.vision.phi3v import (
        Phi3VProcessor, load_phi3v, make_phi3v_encoder, num_img_tokens,
    )

    path = _tiny_phi3v_ckpt(tmp_path)
    text_cfg, params, rope, vision, hf = load_phi3v(path, dtype=jnp.float32)

    with safe_open(path + "/model.safetensors", framework="pt") as h:
        sd = {k: h.get_tensor(k) for k in h.keys()}

    # ---- torch CLIP tower from the same weights
    vm = "model.vision_embed_tokens.img_processor.vision_model."
    clip_cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                                num_hidden_layers=2, num_attention_heads=4,
                                image_size=336, patch_size=14)
    clip = CLIPVisionModel(clip_cfg).eval()
    clip_sd = {"vision_model." + k[len(vm):]: v for k, v in sd.items()
               if k.startswith(vm)}
    missing, unexpected = clip.load_state_dict(clip_sd, strict=False)
    assert not unexpected and all("position_ids" in m or not m for m in missing)

    vp = "model.vision_embed_tokens."
    glb_gn = sd[vp + "glb_GN"].float()          # [1, 1, 4C]
    sub_gn = sd[vp + "sub_GN"].float()          # [1, 1, 1, 4C]
    p0w, p0b = sd[vp + "img_projection.0.weight"].float(), sd[vp + "img_projection.0.bias"].float()
    p2w, p2b = sd[vp + "img_projection.2.weight"].float(), sd[vp + "img_projection.2.bias"].float()

    # ---- same preprocessing output feeds both sides (resize semantics are
    # covered by the transforms tests; this test pins everything after)
    class FakeTok:
        def encode(self, s, add_special_tokens=True):
            return [(3 + (hash(w) % 90)) for w in s.split()]

    proc = Phi3VProcessor(FakeTok(), image_token_id=120, num_crops=4)
    rng = np.random.default_rng(13)
    img = Image.fromarray(rng.integers(0, 255, size=(250, 500, 3), dtype=np.uint8))
    ids, pixel = proc("a b <|image|> c d", [img])
    px = torch.from_numpy(np.asarray(pixel[0]["pixel_values"], np.float32))
    Hh, Ww = pixel[0]["orig_hw"]
    h, w = Hh // 336, Ww // 336

    # ---- oracle HD embedding (HF Phi-3-vision algorithm, independent impl)
    with torch.no_grad():
        hs = clip(px, output_hidden_states=True).hidden_states[-2]  # layer_idx=-2
        feats = hs[:, 1:].float()  # patch features [n, 576, C]
        N, P, C = feats.shape
        Hp = int(P ** 0.5)

        def pool4(x):  # [n, 24, 24, C] -> [n, 12, 12, 4C]
            n = x.shape[0]
            return (x.reshape(n, Hp // 2, 2, Hp // 2, 2, C)
                     .permute(0, 1, 3, 2, 4, 5).reshape(n, Hp // 2, Hp // 2, 4 * C))

        g = pool4(feats[:1].reshape(1, Hp, Hp, C))
        g = torch.cat([g, sub_gn.expand(1, Hp // 2, 1, 4 * C)], dim=2).reshape(1, -1, 4 * C)
        s = pool4(feats[1:1 + h * w].reshape(h * w, Hp, Hp, C))
        s = (s.reshape(1, h, w, Hp // 2, Hp // 2, 4 * C)
              .permute(0, 1, 3, 2, 4, 5).reshape(1, h * Hp // 2, w * Hp // 2, 4 * C))
        s = torch.cat([s, sub_gn.expand(1, h * Hp // 2, 1, 4 * C)], dim=2).reshape(1, -1, 4 * C)
        emb = torch.cat([s, glb_gn, g], dim=1)  # sub_glb order
        proj = F.gelu(emb[0] @ p0w.T + p0b, approximate="none") @ p2w.T + p2b

    # feature-level parity vs our encoder
    class S: pass
    s_obj = S(); s_obj.images = pixel
    ours = np.asarray(make_phi3v_encoder(vision)(s_obj))
    assert ours.shape == tuple(proj.shape)
    np.testing.assert_allclose(ours, proj.numpy(), rtol=2e-4, atol=2e-4)

    # ---- oracle generate: negative ids mark the image span (ref convention)
    tcfg = Phi3Config(vocab_size=128, hidden_size=48, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=2048,
                      rms_norm_eps=1e-5, pad_token_id=0, bos_token_id=1,
                      eos_token_id=2)
    text = Phi3ForCausalLM(tcfg).eval()
    text_sd = {k: v for k, v in sd.items() if not k.startswith(vp)}
    missing, unexpected = text.load_state_dict(text_sd, strict=False)
    assert not unexpected
    n_img = num_img_tokens((Hh, Ww))
    neg_ids = [i if i != 120 else -1 for i in ids]
    assert neg_ids.count(-1) == n_img
    with torch.no_grad():
        t_ids = torch.tensor([neg_ids])
        embeds = text.get_input_embeddings()(t_ids.clamp(min=0)).float()
        embeds[0, t_ids[0] < 0] = proj
        out = text.generate(inputs_embeds=embeds, max_new_tokens=6,
                            do_sample=False)
        want = out[0].tolist()[-6:]

    # ---- our engine (positive placeholder ids)
    from mistralrs_tpu.engine.engine import Engine, GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.pipeline.text import PipelineConfig
    from mistralrs_tpu.pipeline.vision import VisionPipeline

    pc = PipelineConfig(page_size=16, num_pages=128, max_seqs=2,
                        max_model_len=2048, prefill_buckets=(256, 1024),
                        dtype=jnp.float32)
    pipe = VisionPipeline(text_cfg, params, rope, pc, image_token_id=120,
                          encode_images=make_phi3v_encoder(vision))
    eng = Engine(pipe, eos_token_ids=set())
    g = eng.add_request(GenerationRequest(list(ids), SamplingParams(max_len=6)))
    g.seqs[0].images = pixel
    while eng.has_work:
        eng.step()
    assert g.seqs[0].generated_tokens == want


def test_decode_image_rejects_local_paths_for_remote_clients(tmp_path):
    """The HTTP server decodes client images with allow_local_files=False:
    bare paths and file:// URLs must raise instead of reading server files."""
    import base64
    import io

    import pytest
    from PIL import Image

    from mistralrs_tpu.vision.processor import decode_image

    img = Image.new("RGB", (8, 8), (1, 2, 3))
    p = tmp_path / "secret.png"
    img.save(p)
    # Python API convenience: local paths still work by default
    assert decode_image(str(p)).size == (8, 8)
    with pytest.raises(ValueError):
        decode_image(str(p), allow_local_files=False)
    with pytest.raises(ValueError):
        decode_image("file://" + str(p), allow_local_files=False)
    # data: URLs and raw base64 work in both modes
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    assert decode_image(b64, allow_local_files=False).size == (8, 8)
    assert decode_image("data:image/png;base64," + b64,
                        allow_local_files=False).size == (8, 8)


def test_vision_interactive_repl(tmp_path, monkeypatch, capsys):
    """--vi REPL: \\image attaches, bad paths don't kill the session, and a
    multi-turn chat decodes (scripted stdin)."""
    import builtins
    import json as _json

    from safetensors.torch import save_file
    from tokenizers import Tokenizer, models, pre_tokenizers

    cfg, hfm = _tiny_llava(seed=3)
    d = tmp_path / "llava_repl"
    d.mkdir()
    save_file({k: v.contiguous() for k, v in hfm.state_dict().items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(cfg.to_json_string())
    tok = Tokenizer(models.WordLevel({f"w{i}": i for i in range(128)},
                                     unk_token="w0"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text("{}")

    from mistralrs_tpu.api import VisionRunner
    from mistralrs_tpu.pipeline.text import PipelineConfig
    from mistralrs_tpu.server.interactive import vision_interactive_chat

    pc = PipelineConfig(page_size=4, num_pages=128, max_seqs=2,
                        max_model_len=256, prefill_buckets=(16, 32, 64),
                        dtype=jnp.float32)
    r = VisionRunner(str(d), "llava", dtype=jnp.float32, pipeline_config=pc)
    img_path = tmp_path / "img.png"
    Image.fromarray(np.random.default_rng(9).integers(
        0, 255, (40, 50, 3), dtype=np.uint8)).save(img_path)
    inputs = iter([
        f"\\image {tmp_path}/nope.png", "w1 w2",  # bad path: error, survive
        f"\\image {img_path}", "w5 w6 w7",        # good image turn
        "exit",
    ])
    monkeypatch.setattr(builtins, "input", lambda prompt="": next(inputs))
    vision_interactive_chat(r, max_tokens=4)
    r.shutdown()
    out = capsys.readouterr().out
    assert "[error]" in out  # bad path reported, session continued
