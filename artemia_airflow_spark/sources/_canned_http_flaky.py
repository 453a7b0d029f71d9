"""Failure-mode canned transport for the httpjson DataSource tests:
deterministic pagination faults (flaky page, malformed body, missing
records_key, empty tail, permanent outage) keyed by URL path, so the
reader's retry/error contract is testable without a network.

The per-process attempt counter makes the /flaky path fail its first
``_FLAKY_FAILURES`` fetches then succeed — the reader's IN-READ retry
loop runs inside one Python worker process, so a module global is the
correct scope (a Spark task-level retry would land on a fresh counter,
which is exactly the semantics a real transient outage has too).
"""

from __future__ import annotations

import json
from collections import defaultdict
from urllib.parse import parse_qs, urlparse

_FLAKY_FAILURES = 2
_attempts: dict[str, int] = defaultdict(int)


def _page_body(page: int) -> str:
    runs = [
        {
            "id": page * 100 + i,
            "status": "completed" if i % 3 else "in_progress",
            "conclusion": "success" if i % 2 else "failure",
        }
        for i in range(10)
    ]
    return json.dumps({"workflow_runs": runs})


def fetch(url: str) -> str:
    parsed = urlparse(url)
    page = int(parse_qs(parsed.query).get("page", ["1"])[0])
    path = parsed.path
    if path.endswith("/flaky"):
        _attempts[url] += 1
        if _attempts[url] <= _FLAKY_FAILURES:
            raise ConnectionError(f"canned transient outage #{_attempts[url]}")
        return _page_body(page)
    if path.endswith("/alwaysdown"):
        raise ConnectionError("canned permanent outage")
    if path.endswith("/malformed"):
        return _page_body(page) if page == 1 else "{not json"
    if path.endswith("/missingkey"):
        return json.dumps({"something_else": []})
    if path.endswith("/notalist"):
        return json.dumps({"workflow_runs": {"oops": 1}})
    if path.endswith("/emptytail"):
        return _page_body(page) if page == 1 else json.dumps({"workflow_runs": []})
    return _page_body(page)
