"""Optional live-LLM client for the NL front-end (reference agent.py:25-27
pins `ChatOpenAI(model="gpt-3.5-turbo")`; here ANY OpenAI-compatible
chat-completions endpoint works and nothing is load-bearing without one).

Stdlib-only (urllib) so the engine gains no dependency; env-gated the same
way the real embedding model is (similarity.make_embedder_udf):

    LLM_BASE_URL   e.g. http://localhost:8000/v1  (no default — unset = off)
    LLM_API_KEY    bearer token (optional for local servers)
    LLM_MODEL      model name (default "gpt-3.5-turbo", as the reference)

`make_llm_from_env()` returns a `prompt -> sql` callable when configured,
else None — plug it straight into TransformationAgent(llm=...). The
response text goes through the agent's existing fence-stripping and
DuckDB-dialect shim, so any SQL-speaking model slots in. Offline (this
container) the deterministic catalog-rule compiler remains the only path;
tests/test_llm_client.py runs the live path when an endpoint is present
and skips-with-reason otherwise.
"""

from __future__ import annotations

import json
import os
import urllib.request

DEFAULT_MODEL = "gpt-3.5-turbo"  # the reference's pin (agent.py:25)


def make_openai_compatible_llm(base_url: str, api_key: str = "",
                               model: str = DEFAULT_MODEL,
                               timeout: float = 30.0):
    """`prompt -> completion text` against {base_url}/chat/completions."""
    url = base_url.rstrip("/") + "/chat/completions"

    def llm(prompt: str) -> str:
        body = json.dumps({
            "model": model,
            "messages": [{"role": "user", "content": prompt}],
            "temperature": 0,
        }).encode("utf-8")
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"})
        if api_key:
            req.add_header("Authorization", f"Bearer {api_key}")
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            out = json.load(resp)
        return out["choices"][0]["message"]["content"]

    return llm


def make_llm_from_env():
    """The injectable LLM when the environment provides one, else None."""
    base = os.environ.get("LLM_BASE_URL", "").strip()
    if not base:
        return None
    return make_openai_compatible_llm(
        base,
        api_key=os.environ.get("LLM_API_KEY", ""),
        model=os.environ.get("LLM_MODEL", DEFAULT_MODEL),
    )
