"""Golden chat-template tests: our jinja rendering vs
transformers.apply_chat_template on the standard template families the
reference golden-tests (pipeline/mod.rs:408-652: ChatML, Mistral, Llama-2,
Gemma, Phi-3)."""

import pytest

from mistralrs_tpu.pipeline.chat_template import apply_chat_template, flatten_text_content

CHATML = (
    "{% for message in messages %}{{'<|im_start|>' + message['role'] + '\n' +"
    " message['content'] + '<|im_end|>' + '\n'}}{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
)

LLAMA2 = (
    "{% if messages[0]['role'] == 'system' %}{% set loop_messages = messages[1:] %}"
    "{% set system_message = messages[0]['content'] %}{% else %}"
    "{% set loop_messages = messages %}{% set system_message = false %}{% endif %}"
    "{% for message in loop_messages %}"
    "{% if (message['role'] == 'user') != (loop.index0 % 2 == 0) %}"
    "{{ raise_exception('Conversation roles must alternate user/assistant/user/assistant/...') }}"
    "{% endif %}"
    "{% if loop.index0 == 0 and system_message != false %}"
    "{% set content = '<<SYS>>\\n' + system_message + '\\n<</SYS>>\\n\\n' + message['content'] %}"
    "{% else %}{% set content = message['content'] %}{% endif %}"
    "{% if message['role'] == 'user' %}{{ bos_token + '[INST] ' + content.strip() + ' [/INST]' }}"
    "{% elif message['role'] == 'assistant' %}{{ ' ' + content.strip() + ' ' + eos_token }}"
    "{% endif %}{% endfor %}"
)

MISTRAL = (
    "{{ bos_token }}{% for message in messages %}"
    "{% if (message['role'] == 'user') != (loop.index0 % 2 == 0) %}"
    "{{ raise_exception('Conversation roles must alternate user/assistant/user/assistant/...') }}"
    "{% endif %}{% if message['role'] == 'user' %}{{ '[INST] ' + message['content'] + ' [/INST]' }}"
    "{% elif message['role'] == 'assistant' %}{{ message['content'] + eos_token}}"
    "{% else %}{{ raise_exception('Only user and assistant roles are supported!') }}"
    "{% endif %}{% endfor %}"
)

GEMMA = (
    "{{ bos_token }}{% if messages[0]['role'] == 'system' %}"
    "{{ raise_exception('System role not supported') }}{% endif %}"
    "{% for message in messages %}"
    "{% if (message['role'] == 'user') != (loop.index0 % 2 == 0) %}"
    "{{ raise_exception('Conversation roles must alternate user/assistant/user/assistant/...') }}"
    "{% endif %}{% if (message['role'] == 'assistant') %}{% set role = 'model' %}"
    "{% else %}{% set role = message['role'] %}{% endif %}"
    "{{ '<start_of_turn>' + role + '\n' + message['content'] | trim + '<end_of_turn>\n' }}"
    "{% endfor %}{% if add_generation_prompt %}{{'<start_of_turn>model\n'}}{% endif %}"
)

PHI3 = (
    "{% for message in messages %}{% if message['role'] == 'system' %}"
    "{{'<|system|>\n' + message['content'] + '<|end|>\n'}}"
    "{% elif message['role'] == 'user' %}{{'<|user|>\n' + message['content'] + '<|end|>\n'}}"
    "{% elif message['role'] == 'assistant' %}{{'<|assistant|>\n' + message['content'] + '<|end|>\n'}}"
    "{% endif %}{% endfor %}{% if add_generation_prompt %}{{ '<|assistant|>\n' }}"
    "{% else %}{{ eos_token }}{% endif %}"
)


def _hf_render(template, messages, bos="<s>", eos="</s>", add_gen=True):
    from transformers.utils.chat_template_utils import render_jinja_template

    out, _ = render_jinja_template(
        conversations=[messages],
        chat_template=template,
        add_generation_prompt=add_gen,
        bos_token=bos,
        eos_token=eos,
        unk_token="<unk>",
    )
    return out[0]


MSGS = [
    {"role": "user", "content": "Hello"},
    {"role": "assistant", "content": "Hi there"},
    {"role": "user", "content": "Who are you"},
    {"role": "assistant", "content": "   I am an assistant   "},
    {"role": "user", "content": "Another question"},
]

SYS_MSGS = [{"role": "system", "content": "Be helpful."}] + MSGS


@pytest.mark.parametrize(
    "name,template,messages",
    [
        ("chatml", CHATML, MSGS),
        ("chatml_sys", CHATML, SYS_MSGS),
        ("llama2", LLAMA2, MSGS),
        ("llama2_sys", LLAMA2, SYS_MSGS),
        ("mistral", MISTRAL, MSGS),
        ("gemma", GEMMA, MSGS),
        ("phi3", PHI3, MSGS),
    ],
)
def test_render_matches_transformers(name, template, messages):
    got = apply_chat_template(
        template, messages, add_generation_prompt=True, bos_token="<s>", eos_token="</s>",
        unk_token="<unk>",
    )
    want = _hf_render(template, messages)
    assert got == want


def test_raise_exception_propagates():
    bad = [{"role": "assistant", "content": "i go first"}, {"role": "user", "content": "hi"}]
    from mistralrs_tpu.pipeline.chat_template import TemplateError

    with pytest.raises(TemplateError, match="alternate"):
        apply_chat_template(MISTRAL, bad, bos_token="<s>", eos_token="</s>")


def test_flatten_text_content():
    msgs = [
        {"role": "user", "content": [{"type": "text", "text": "a"}, {"type": "text", "text": "b"}]},
        {"role": "assistant", "content": "plain"},
    ]
    out = flatten_text_content(msgs)
    assert out[0]["content"] == "ab"
    assert out[1]["content"] == "plain"


def test_strftime_now_available():
    out = apply_chat_template("{{ strftime_now('%Y') }}", [])
    assert len(out) == 4 and out.isdigit()


def test_tools_tojson():
    t = "{% if tools %}{{ tools | tojson }}{% endif %}"
    out = apply_chat_template(t, [], tools=[{"name": "f"}])
    assert out == '[{"name": "f"}]'
