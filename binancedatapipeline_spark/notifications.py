"""Alert formatting + Telegram transport, parity with the reference's
TelegramNotifier (scheduler_clickhouse.py:25-64): message + optional
result-table rendered into an HTML ``<pre>`` block and POSTed to the
Bot API.

The formatting and payload construction are pure and fully tested;
the HTTP POST itself is an injected callable (this sandbox has no
network), defaulting to a stdlib urllib POST on a real deployment.
Result tables are Spark DataFrames here, bounded with ``limit``
before the driver ever sees them — an alert can safely reference an
unbounded relation.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame

# Telegram rejects messages beyond 4096 chars
MAX_MESSAGE_LEN = 4096


def format_alert(
    message: str,
    df: DataFrame | None = None,
    max_rows: int = 20,
    max_len: int = MAX_MESSAGE_LEN,
) -> str:
    """The reference's ``message + df.to_string()`` rendering
    (scheduler_clickhouse.py:44-49), bounded for distributed inputs:
    at most ``max_rows`` rows are collected (``limit(max_rows+1)`` —
    one extra row only to detect truncation, never a count over the
    relation), and the final text is clipped to Telegram's length cap.

    Message and table text are HTML-escaped (&, <, >) — Telegram
    rejects the whole payload with a parse error on unescaped markup
    characters under parse_mode=HTML, which would silently eat any
    alert mentioning e.g. 'A&B' or a '<PERP>' symbol. The length clip
    shrinks the TABLE text to fit (never slicing through a tag OR an
    escape entity — the cut point backs off over a trailing partial
    ``&amp;``-style entity, so ``&am…`` can never appear), and falls
    back to clipping the bare message when even an empty block would
    not fit — the output is always well-formed."""
    from html import escape

    body = escape(message)
    if df is not None:
        pdf = df.limit(max_rows + 1).toPandas()
        if len(pdf):
            truncated = len(pdf) > max_rows
            table = escape(pdf.head(max_rows).to_string(index=False))
            if truncated:
                table += "\n…"
            frame_len = len("\n\n<pre></pre>")
            room = max_len - len(body) - frame_len
            if room >= 1:
                if len(table) > room:
                    table = _clip_escaped(table, room)
                body += "\n\n<pre>" + table + "</pre>"
    if len(body) > max_len:  # table-less message longer than the cap
        body = _clip_escaped(body, max_len)
    return body


def _clip_escaped(text: str, limit: int) -> str:
    """Clip already-HTML-escaped text to ``limit`` chars (ellipsis
    included) without slicing through an entity: if the cut lands
    mid-``&amp;``/``&#39;``, back the cut point off to just before
    the ``&``. Entities produced by ``html.escape`` are ≤6 chars, so
    the backoff scan is bounded."""
    cut = text[: limit - 1]
    amp = cut.rfind("&")
    if amp != -1 and ";" not in cut[amp:] and len(cut) - amp < 6:
        cut = cut[:amp]
    return cut + "…"


def _urllib_post(url: str, payload: dict) -> dict:
    """Default transport: stdlib POST (no requests dependency).
    Replaced by an injected callable in tests and sandboxes."""
    from urllib.request import Request, urlopen

    req = Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urlopen(req, timeout=10) as resp:
        return json.loads(resp.read().decode())


class TelegramNotifier:
    """Drop-in for ``Pipeline(notify=...)``: callable with a message,
    or :meth:`send` with an attached result table.

    Credentials come from the same environment variables the
    reference reads (TELEGRAM_BOT_TOKEN / TELEGRAM_CHAT_ID,
    scheduler_clickhouse.py:26-31); unconfigured instances degrade to
    a no-op that returns None instead of raising — an alerting
    failure must never kill the pipeline tick (the reference
    swallows send errors the same way, ch scheduler:60-64)."""

    def __init__(
        self,
        token: str | None = None,
        chat_id: str | None = None,
        post: Callable[[str, dict], dict] | None = None,
    ):
        self.token = token or os.environ.get("TELEGRAM_BOT_TOKEN")
        self.chat_id = chat_id or os.environ.get("TELEGRAM_CHAT_ID")
        self.post = post or _urllib_post

    @property
    def configured(self) -> bool:
        return bool(self.token and self.chat_id)

    def payload(self, text: str) -> tuple[str, dict]:
        """(url, json payload) exactly as the Bot API expects."""
        return (
            f"https://api.telegram.org/bot{self.token}/sendMessage",
            {"chat_id": self.chat_id, "text": text, "parse_mode": "HTML"},
        )

    def send(self, message: str, df: DataFrame | None = None) -> dict | None:
        if not self.configured:
            return None
        url, payload = self.payload(format_alert(message, df))
        try:
            return self.post(url, payload)
        except Exception:
            return None  # alerting must not fail the pipeline

    def __call__(self, message: str) -> None:
        self.send(message)
