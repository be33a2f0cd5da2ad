"""API-based sinks: webhook and Mixpanel destinations.

Reference: ``bulkerlib/implementations/api_based/`` — ``webhook.go:1-252``
(configurable URL/method/headers, JSON-array batches, ``{{ ... }}``
payload macros, 502/503 retried), ``mixpanel.go:1-195`` (gzip NDJSON to
``/import?strict=1``, service-account basic auth, EU data residency,
400-with-partial-validation reported but NOT failed, 500/502/503
retried), both batch-mode-only behind ``transactional_stream.go``.

Spark-first shape: rows serialize JVM-side (``df.toJSON`` — one codegen
projection, no Python per-row work) and upload EXECUTOR-side via
``foreachPartition``: every partition ships its own slice in bounded
chunks, so the sink scales with the cluster instead of funneling the
batch through the driver. The reference uploads once per batch from a
single process; distributing preserves its per-request semantics
(format, headers, retry ladder) while removing the single-uploader
bottleneck — the documented tradeoff is at-least-once delivery on task
retry, exactly the reference's own retry-ladder semantics. The ONE
webhook feature that genuinely needs the whole batch in a single body —
``custom_payload`` with ``{{ EVENT/EVENTS }}`` macros — runs on the
driver and is intended for alert/notification-style hooks, not bulk
delivery (the reference builds that body in memory too,
``webhook.go:115-168``).
"""

from __future__ import annotations

import base64
import gzip
import json
import re
import time
import urllib.error
import urllib.request
from typing import Any

from pyspark.sql import DataFrame

#: the reference's retry ladder (mixpanel.go:25) — the final 0 means the
#: last attempt is not followed by a sleep
RETRY_DELAYS_MS = (100, 200, 200, 500, 0)

_MACRO = re.compile(r"\{\{\s*([\w.-]+)\s*\}\}")


class ApiSinkError(RuntimeError):
    """Terminal upload failure (non-retryable status, or retries
    exhausted)."""


def _http(
    url: str,
    body: bytes,
    headers: dict[str, str],
    method: str = "POST",
    timeout: float = 5.0,
) -> tuple[int, str]:
    req = urllib.request.Request(
        url, data=body, method=method.upper(), headers=headers
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read().decode("utf-8", "replace")
    except urllib.error.HTTPError as ex:  # non-2xx still has a body
        return ex.code, ex.read().decode("utf-8", "replace")
    except (urllib.error.URLError, OSError) as ex:
        raise ConnectionError(str(ex)) from ex


def _upload_with_retries(
    url: str,
    body: bytes,
    headers: dict[str, str],
    method: str,
    retry_statuses: frozenset[int],
    retry_conn_errors: bool,
    timeout: float,
) -> tuple[int, str]:
    """The reference's ladder: retry listed statuses (and optionally
    connection errors) at fixed delays; anything else returns/raises
    immediately."""
    last: Exception | None = None
    for delay_ms in RETRY_DELAYS_MS:
        try:
            status, resp = _http(url, body, headers, method, timeout)
        except ConnectionError as ex:
            last = ex
            if retry_conn_errors:
                time.sleep(delay_ms / 1000.0)
                continue
            raise ApiSinkError(f"connection error: {ex}") from ex
        if status in retry_statuses:
            last = ApiSinkError(f"http status: {status}")
            time.sleep(delay_ms / 1000.0)
            continue
        return status, resp
    raise ApiSinkError(f"retries exhausted: {last}")


class WebhookSink:
    """Webhook destination (``webhook.go``): JSON-array batches POSTed
    to a configurable URL with configurable method/headers.

    ``headers`` use the reference's ``"Name: value"`` string form.
    ``custom_payload`` enables the macro template (driver-side, single
    request per upload): ``{{ EVENT }}`` (exactly-one-event batch),
    ``{{ EVENTS }}`` (the JSON array), ``{{ EVENTS_COUNT }}``,
    ``{{ NAME }}``/``{{ EVENTS_NAME }}``, ``{{ env.X }}``.
    """

    RETRY_STATUSES = frozenset({502, 503})  # webhook.go:215-218

    def __init__(
        self,
        url: str,
        *,
        method: str = "POST",
        headers: list[str] | None = None,
        custom_payload: bool = False,
        payload: str = "",
        chunk_size: int = 10_000,
        timeout: float = 5.0,
        retry_conn_errors: bool = False,
    ):
        self.url = url
        self.method = method
        self.headers = {"Content-Type": "application/json"}
        for h in headers or []:  # "Name: value" pairs (webhook.go:178-185)
            name, sep, value = h.partition(":")
            self.headers[name.strip()] = value.strip() if sep else ""
        self.custom_payload = custom_payload
        self.payload = payload
        self.chunk_size = chunk_size
        self.timeout = timeout
        # the reference retries conn errors only on its managed ingest
        # endpoint (webhook.go:188-195); expose the knob directly
        self.retry_conn_errors = retry_conn_errors

    # -- payload macros (webhook.go:115-168) -------------------------------
    def _render(
        self, lines: list[str], events_name: str, env: dict[str, Any]
    ) -> bytes:
        def sub(m: re.Match) -> str:
            name = m.group(1)
            up = name.upper()
            if up == "EVENT":
                if len(lines) != 1:
                    raise ApiSinkError(
                        "{{ EVENT }} macros: expects only one event. "
                        f"Got {len(lines)}"
                    )
                return lines[0]
            if up == "EVENTS":
                return "[" + ",".join(lines) + "]"
            if up == "EVENTS_COUNT":
                return str(len(lines))
            if up in ("NAME", "EVENTS_NAME"):
                return events_name
            if name.startswith("env."):
                return str(env.get(name[4:], ""))
            raise ApiSinkError(f"{{{{ {name} }}}} macros: unknown macro")

        return _MACRO.sub(sub, self.payload).encode()

    def _post_chunk(self, lines: list[str]) -> None:
        body = ("[" + ",".join(lines) + "]").encode()
        status, resp = _upload_with_retries(
            self.url,
            body,
            self.headers,
            self.method,
            self.RETRY_STATUSES,
            self.retry_conn_errors,
            self.timeout,
        )
        if status != 200:
            raise ApiSinkError(f"status: {status} body: {resp[:500]}")

    def upload(
        self,
        df: DataFrame,
        events_name: str = "events",
        env: dict[str, Any] | None = None,
    ) -> int:
        """Ship a DataFrame. Returns the number of events sent.

        Plain mode: executor-distributed — each partition POSTs its rows
        in ``chunk_size``-bounded JSON arrays. Custom-payload mode:
        driver-side single request (the macro body needs the whole
        batch).

        Delivery is AT-LEAST-ONCE: a task retry or a speculative
        duplicate re-POSTs chunks the failed/slower attempt already
        delivered. Run these sinks with ``spark.speculation=false``
        (retries remain possible even then), and make the receiver
        idempotent — dedup on a stable event id the way Mixpanel dedups
        on ``$insert_id``; a generic webhook should honor an
        idempotency key carried in the payload."""
        if self.custom_payload:
            lines = df.toJSON().collect()
            body = self._render(lines, events_name, dict(env or {}))
            status, resp = _upload_with_retries(
                self.url,
                body,
                self.headers,
                self.method,
                self.RETRY_STATUSES,
                self.retry_conn_errors,
                self.timeout,
            )
            if status != 200:
                raise ApiSinkError(f"status: {status} body: {resp[:500]}")
            return len(lines)
        sink = self
        count = df.sparkSession.sparkContext.accumulator(0)

        def ship(it) -> None:
            buf: list[str] = []
            for line in it:
                buf.append(line)
                if len(buf) >= sink.chunk_size:
                    sink._post_chunk(buf)
                    count.add(len(buf))
                    buf.clear()
            if buf:
                sink._post_chunk(buf)
                count.add(len(buf))

        df.toJSON().foreachPartition(ship)
        return count.value


class MixpanelSink:
    """Mixpanel ``/import`` destination (``mixpanel.go``): gzip NDJSON,
    service-account basic auth, ``strict=1``; 500/502/503 and connection
    errors ride the retry ladder; a 400 carrying partial-validation
    results is reported (returned) but does NOT fail the batch —
    Mixpanel imported the valid records (mixpanel.go:133-168)."""

    RETRY_STATUSES = frozenset({500, 502, 503})

    def __init__(
        self,
        project_id: str,
        service_account_username: str,
        service_account_password: str,
        *,
        data_residency: str = "US",
        chunk_size: int = 2000,  # Mixpanel's documented /import cap
        timeout: float = 5.0,
        api_base: str | None = None,
    ):
        host = (
            "api-eu.mixpanel.com"
            if data_residency.upper() == "EU"
            else "api.mixpanel.com"
        )
        base = api_base or f"https://{host}"
        self.url = f"{base}/import?strict=1&project_id={project_id}"
        creds = f"{service_account_username}:{service_account_password}"
        self.headers = {
            "Content-Type": "application/x-ndjson",
            "Accept": "application/json",
            "Content-Encoding": "gzip",
            "Authorization": "Basic "
            + base64.b64encode(creds.encode()).decode(),
        }
        self.chunk_size = chunk_size
        self.timeout = timeout

    def _post_chunk(self, lines: list[str]) -> str | None:
        """Returns a validation report string for partial 400s, None on
        clean success; raises ApiSinkError on terminal failure."""
        body = gzip.compress(("\n".join(lines)).encode())
        status, resp = _upload_with_retries(
            self.url,
            body,
            self.headers,
            "POST",
            self.RETRY_STATUSES,
            True,  # mixpanel retries connection errors unconditionally
            self.timeout,
        )
        if status == 200:
            return None
        if status == 400 and "failed validation" in resp:
            try:
                ve = json.loads(resp)
            except ValueError:
                return resp
            if int(ve.get("num_records_imported") or 0) == 0:
                raise ApiSinkError(f"http status: {status} body: {resp[:500]}")
            failed = ve.get("failed_records") or []
            report = [
                f"Imported: {ve['num_records_imported']} "
                f"Failed: {len(failed)}:"
            ]
            for fr in failed:
                idx = int(fr.get("index", -1))
                ev = lines[idx] if 0 <= idx < len(lines) else ""
                report.append(
                    f"$insert_id:{fr.get('$insert_id', '')} "
                    f"{fr.get('field', '')}:{fr.get('message', '')}\n"
                    f"Event:\n{ev}"
                )
            return "\n".join(report)
        raise ApiSinkError(f"http status: {status} body: {resp[:500]}")

    def upload(self, df: DataFrame) -> tuple[int, list[str]]:
        """Ship a DataFrame of Mixpanel-shaped events. Returns
        ``(events_sent, validation_reports)`` — reports collect the
        partial-400 summaries (one per affected chunk)."""
        sink = self
        count = df.sparkSession.sparkContext.accumulator(0)
        reports = df.sparkSession.sparkContext.accumulator(
            [], _ListAccumulator()
        )

        def ship(it) -> None:
            buf: list[str] = []

            def flush() -> None:
                if not buf:
                    return
                rep = sink._post_chunk(buf)
                count.add(len(buf))
                if rep:
                    reports.add([rep])
                buf.clear()

            for line in it:
                buf.append(line)
                if len(buf) >= sink.chunk_size:
                    flush()
            flush()

        df.toJSON().foreachPartition(ship)
        return count.value, list(reports.value)


class _ListAccumulator:
    """AccumulatorParam for collecting small lists of report strings."""

    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a
