"""HTTP replay client for the wire-format sinks.

The ES `_bulk` and Doris/StarRocks Stream Load writers render replayable
request chunks + a ``_requests.jsonl`` manifest (sinks/wire.py). This
module actually SENDS them — stdlib ``urllib`` only — with the
reference's retry semantics:

- retry on 5xx / connection errors up to ``max_retries`` with linear
  backoff (doris_writer.go:484-548 ``for i := 0; i < maxRetries``;
  elasticsearch_writer.go:807-870 trySize/retry loop);
- 4xx fails fast (a malformed request never heals by retrying);
- Stream Load "Label Already Exists" counts as success — the
  content-addressed labels make chunk retries idempotent (Doris dedups
  loads BY LABEL), so a retry after a lost 200 is a no-op, not a dup;
- ES bulk responses with ``"errors": true`` surface the failed items.

In production the manifest URLs point at the real cluster; in tests a
loopback ``http.server`` plays the cluster (tests/test_http_replay.py).
``url_rewrite`` maps the rendered host to the actual endpoint without
re-rendering chunks (the lab/replay split).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from typing import Any, Callable


class ReplayError(RuntimeError):
    pass


def _send_once(req: dict[str, Any], body: bytes, timeout: float) -> tuple[int, bytes]:
    r = urllib.request.Request(
        req["url"], data=body, method=req.get("method", "POST"),
        headers=req.get("headers", {}),
    )
    try:
        with urllib.request.urlopen(r, timeout=timeout) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx WITH a status
        return e.code, e.read()
    # URLError / connection refused propagates: the caller retries it


def send_request(req: dict[str, Any], *, max_retries: int = 3,
                 backoff_s: float = 0.1, timeout: float = 10.0) -> dict[str, Any]:
    """Send one manifest record; returns {status, attempts, response}.

    Retries 5xx and connection errors ``max_retries`` times (linear
    backoff); 4xx raises immediately. The LAST failure raises
    ReplayError with the response body for diagnosis."""
    with open(req["body_file"], "rb") as f:
        body = f.read()
    last: tuple[int, bytes] | None = None
    for attempt in range(1, max_retries + 1):
        try:
            status, resp = _send_once(req, body, timeout)
        except (urllib.error.URLError, ConnectionError, TimeoutError) as e:
            last = (0, str(e).encode())
            if attempt < max_retries:
                time.sleep(backoff_s * attempt)
            continue
        if 200 <= status < 300:
            return {"status": status, "attempts": attempt, "response": resp}
        if 400 <= status < 500:
            raise ReplayError(
                f"{req.get('method')} {req['url']}: HTTP {status} (client "
                f"error, not retried): {resp[:500]!r}"
            )
        last = (status, resp)
        if attempt < max_retries:
            time.sleep(backoff_s * attempt)
    code, resp = last if last else (0, b"")
    raise ReplayError(
        f"{req.get('method')} {req['url']}: failed after {max_retries} "
        f"attempts (last HTTP {code}): {resp[:500]!r}"
    )


def _check_stream_load(resp: bytes) -> str:
    """Doris Stream Load returns 200 even for logical failures; the JSON
    body's Status decides (doris_writer.go:523-548). 'Label Already
    Exists' is SUCCESS here: content-addressed labels mean the chunk is
    already loaded — the idempotent-retry contract."""
    try:
        d = json.loads(resp or b"{}")
    except json.JSONDecodeError:
        raise ReplayError(f"stream load: unparseable response {resp[:200]!r}")
    status = str(d.get("Status", "Success"))
    if status in ("Success", "Publish Timeout", "Label Already Exists"):
        return status
    raise ReplayError(f"stream load failed: {json.dumps(d)[:500]}")


def _check_neo4j_tx(resp: bytes) -> str:
    """The neo4j transaction API returns 200 with an ``errors`` array on
    logical failure — surface it (the bolt writer's per-tx error check,
    neo4j_writer.go:566-575)."""
    try:
        d = json.loads(resp or b"{}")
    except json.JSONDecodeError:
        raise ReplayError(f"tx/commit: unparseable response {resp[:200]!r}")
    errs = d.get("errors") or []
    if errs:
        raise ReplayError(f"neo4j tx reported {len(errs)} errors: "
                          f"{json.dumps(errs[:3])[:500]}")
    return "Success"


def _check_es_bulk(resp: bytes) -> str:
    """ES _bulk is 200 with per-item errors; surface them
    (elasticsearch_writer.go:845-961 checks hasError per item)."""
    try:
        d = json.loads(resp or b"{}")
    except json.JSONDecodeError:
        raise ReplayError(f"_bulk: unparseable response {resp[:200]!r}")
    if d.get("errors"):
        bad = [
            it for it in d.get("items", [])
            for op in it.values()
            if isinstance(op, dict) and op.get("error")
        ]
        raise ReplayError(f"_bulk reported {len(bad)} item errors: "
                          f"{json.dumps(bad[:3])[:500]}")
    return "Success"


def replay_manifest(manifest_path: str, *, max_retries: int = 3,
                    backoff_s: float = 0.1, timeout: float = 10.0,
                    url_rewrite: Callable[[str], str] | None = None) -> dict[str, Any]:
    """Replay every request in a ``_requests.jsonl`` manifest, in file
    order. Returns per-request results + totals. Chunks that already
    loaded (label dedup) count as 'already_loaded', not failures."""
    results = []
    already = 0
    with open(manifest_path) as f:
        for line in f:
            req = json.loads(line)
            if url_rewrite is not None:
                req["url"] = url_rewrite(req["url"])
            r = send_request(req, max_retries=max_retries,
                             backoff_s=backoff_s, timeout=timeout)
            if "_stream_load" in req["url"]:
                verdict = _check_stream_load(r["response"])
            elif req["url"].rstrip("/").endswith("_bulk"):
                verdict = _check_es_bulk(r["response"])
            elif req["url"].rstrip("/").endswith("tx/commit"):
                verdict = _check_neo4j_tx(r["response"])
            else:
                verdict = "Success"
            if verdict == "Label Already Exists":
                already += 1
            results.append({
                "url": req["url"], "label": req.get("label"),
                "status": r["status"], "attempts": r["attempts"],
                "verdict": verdict,
            })
    return {
        "requests": len(results),
        "already_loaded": already,
        "max_attempts": max((r["attempts"] for r in results), default=0),
        "results": results,
    }
