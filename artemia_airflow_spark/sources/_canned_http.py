"""Canned transport module for the httpjson DataSource in CI (no
network).  Deterministic page contents, shaped like the GitHub
workflow-runs endpoint (dags/update_tr_from_ex_dag.py:59-63)."""

from __future__ import annotations

import json
from urllib.parse import parse_qs, urlparse


def fetch(url: str) -> str:
    page = int(parse_qs(urlparse(url).query).get("page", ["1"])[0])
    runs = [
        {
            "id": page * 100 + i,
            "status": "completed" if i % 3 else "in_progress",
            "conclusion": "success" if i % 2 else "failure",
        }
        for i in range(10)
    ]
    return json.dumps({"workflow_runs": runs})
