"""HTTP + CLI frontends.

Reference parity: mistralrs-server (SURVEY.md §2.3) — axum OpenAI routes
(/v1/chat/completions, /v1/completions, /v1/models, /health, /re_isq,
/activate_adapters), SSE streaming, interactive terminal chat, CLI model
selection. Here: aiohttp app (openai.py), argparse CLI (cli.py),
interactive mode (interactive.py), bench CLI (bench_cli.py).
"""
