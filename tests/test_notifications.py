"""Alert formatting + Telegram payload parity
(≙ reference scheduler_clickhouse.py:25-64)."""

from __future__ import annotations

from binancedatapipeline_spark.notifications import (
    MAX_MESSAGE_LEN,
    TelegramNotifier,
    format_alert,
)


def test_format_alert_renders_pre_table(spark):
    df = spark.createDataFrame([(1, 0.5), (2, -0.25)], "symbol_id long, premium double")
    text = format_alert("extreme premium", df.orderBy("symbol_id"))
    assert text.startswith("extreme premium\n\n<pre>")
    assert text.endswith("</pre>")
    assert "premium" in text and "-0.25" in text


def test_format_alert_bounds_rows_and_marks_truncation(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "v long")
    text = format_alert("big", df.orderBy("v"), max_rows=5)
    assert "…" in text
    assert text.count("\n") < 15  # 5 rows + header + markers, not 100


def test_format_alert_clips_to_telegram_limit(spark):
    df = spark.createDataFrame(
        [("x" * 200, i) for i in range(40)], "blob string, i long"
    )
    text = format_alert("clip", df, max_rows=40)
    assert len(text) <= MAX_MESSAGE_LEN
    assert text.endswith("</pre>")  # clipped inside the block, re-closed


def test_format_alert_plain_message_untouched():
    assert format_alert("hello") == "hello"


def test_notifier_payload_and_injection(spark):
    sent = []
    n = TelegramNotifier(token="tok", chat_id="42", post=lambda u, p: sent.append((u, p)) or {"ok": True})
    df = spark.createDataFrame([(1,)], "a long")
    out = n.send("alert!", df)
    assert out == {"ok": True}
    (url, payload), = sent
    assert url == "https://api.telegram.org/bottok/sendMessage"
    assert payload["chat_id"] == "42"
    assert payload["parse_mode"] == "HTML"
    assert payload["text"].startswith("alert!")


def test_notifier_unconfigured_is_noop(monkeypatch):
    monkeypatch.delenv("TELEGRAM_BOT_TOKEN", raising=False)
    monkeypatch.delenv("TELEGRAM_CHAT_ID", raising=False)
    boom = lambda u, p: (_ for _ in ()).throw(RuntimeError("no network"))
    n = TelegramNotifier(post=boom)
    assert not n.configured
    assert n.send("msg") is None  # no post attempted


def test_notifier_send_failure_never_raises():
    def post(url, payload):
        raise RuntimeError("transport down")

    n = TelegramNotifier(token="t", chat_id="c", post=post)
    assert n.send("msg") is None


def test_pipeline_notify_integration(spark, tmp_path):
    """TelegramNotifier plugs into Pipeline's notify seam and receives
    the per-table tick message."""
    from datetime import datetime

    from binancedatapipeline_spark import catalog
    from binancedatapipeline_spark.pipeline import Pipeline, TableJob

    sent = []
    notifier = TelegramNotifier(
        token="t", chat_id="c", post=lambda u, p: sent.append(p) or {"ok": True}
    )
    pipe = Pipeline(spark, str(tmp_path / "wh"), notify=notifier)
    spec = catalog.BN_SPOT_SYMBOLS

    def fetch(s, start, end):
        return s.createDataFrame(
            [("BTCUSDT", "BTC", "USDT", "binance", "SPOT", "TRADING",
              True, True, 8, 8, None, None, None, None, None, None)],
            spec.schema,
        )

    pipe.register(TableJob(spec=spec, fetch=fetch))
    n = pipe.update_table(spec.name, now=datetime(2024, 1, 1))
    assert n == 1
    assert any("bn_spot_symbols" in p["text"] for p in sent)


def test_format_alert_escapes_html_entities(spark):
    df = spark.createDataFrame([("BTC<PERP>", "A&B")], "sym string, pair string")
    text = format_alert("spread < 0.1% & rising", df)
    # no raw markup characters outside the <pre> frame tags
    stripped = text.replace("<pre>", "").replace("</pre>", "")
    assert "<" not in stripped and ">" not in stripped
    assert "&lt;" in text and "&amp;" in text
    assert "BTC<PERP>" not in text  # escaped form only
    assert text.count("<pre>") == 1 and text.count("</pre>") == 1


def test_format_alert_clip_never_slices_tags(spark):
    # sweep max_len so the cut lands on every boundary around the tags
    df = spark.createDataFrame([("y" * 50,)], "blob string")
    for max_len in range(20, 120, 3):
        text = format_alert("x" * 30, df, max_rows=5, max_len=max_len)
        assert len(text) <= max_len
        assert text.count("<pre>") == text.count("</pre>")
        assert "<pr" not in text.replace("<pre>", "")
