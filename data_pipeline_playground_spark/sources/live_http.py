"""Live HTTP fetch_fn implementations (S5 html_fetch — the online half;
reference realtimeapi.py:50-82 / reddit_api.py:40-48 fetch with aiohttp).

These are stdlib-urllib backed so they work in this container without
`requests`; every public function returns a ``FetchFn`` (url -> html |
None) that plugs into sources.http_sources.fetch_and_extract unchanged —
the Spark plan (mapInPandas batches, null propagation on failure) is
identical in offline and online mode, which is the point: connectors
swap at the edge, not in the plan.

Network semantics mirror the reference:
- any non-2xx / transport error → None (null row downstream, S5);
- a User-Agent header is always sent (reddit rejects the default one,
  reference reddit.py:20-24);
- per-request timeout so a hung endpoint cannot stall an executor task
  slot indefinitely.

Tests drive these against a loopback http.server — no external traffic
(tests/test_live_http.py); nothing in the batch/streaming surface calls
the network implicitly.
"""

from __future__ import annotations

import gzip
import json as _json
import urllib.error
import urllib.parse
import urllib.request

DEFAULT_TIMEOUT_S = 10.0
USER_AGENT = "data-pipeline-playground-spark/0.1"


def _read_body(resp) -> str:
    raw = resp.read()
    if resp.headers.get("Content-Encoding") == "gzip":
        raw = gzip.decompress(raw)
    charset = resp.headers.get_content_charset() or "utf-8"
    return raw.decode(charset, errors="replace")


def http_fetch_fn(timeout_s: float = DEFAULT_TIMEOUT_S,
                  headers: dict[str, str] | None = None):
    """FetchFn fetching a URL's body as text; None on any failure."""
    base_headers = {"User-Agent": USER_AGENT, **(headers or {})}

    def fetch(url: str) -> str | None:
        if not url or not url.startswith(("http://", "https://")):
            return None
        req = urllib.request.Request(url, headers=base_headers)
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                if not (200 <= resp.status < 300):
                    return None
                return _read_body(resp)
        except (urllib.error.URLError, OSError, ValueError):
            return None

    return fetch


def json_api_fetch_fn(base_url: str, params: dict[str, str] | None = None,
                      timeout_s: float = DEFAULT_TIMEOUT_S,
                      headers: dict[str, str] | None = None):
    """FetchFn-shaped JSON GET for the API connectors (S2/S3/S4): the
    returned callable takes extra query params, merges them over
    ``params``, and returns the decoded JSON document (None on failure)
    — the online analogue of the fixture files read_newsapi/read_reddit
    consume. Callers persist the response to a fixture path and then
    reuse the exact offline reader, so one code path parses both."""
    fetch = http_fetch_fn(timeout_s=timeout_s, headers=headers)

    def call(extra_params: dict[str, str] | None = None):
        q = {**(params or {}), **(extra_params or {})}
        url = base_url + ("?" + urllib.parse.urlencode(q) if q else "")
        body = fetch(url)
        if body is None:
            return None
        try:
            return _json.loads(body)
        except ValueError:
            return None

    return call


# Ship by value for executor-side use from a foreign cwd (same pattern
# as sources/css_select.py).
import sys as _sys

from pyspark.cloudpickle import register_pickle_by_value as _by_value

_by_value(_sys.modules[__name__])
