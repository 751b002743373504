"""Per-row HTTP enrichment source (S2 — /root/reference/worker.py:24-31).

The reference fetches each post's language-filtered sentences from a
lang-detector HTTP service inside its per-post thread
(``GET {uri}/{target}/{id}?filter={lang}`` -> ``{"text": [sent, ...]}``,
then ``' '.join(text)`` at worker.py:28-29). The Spark shape is
``mapInPandas`` with ONE connection/session per partition (UD1: expensive
init in the iterator prologue, never per row), Arrow-batched both ways.

No network exists in this container, so the default transport is a
deterministic local fake that mimics the service's response envelope; a
real deployment passes ``transport=requests_transport(base_uri)``. The
plumbing — batch iteration, session reuse, JSON envelope parsing, the
``' '.join`` — is identical either way, which is what the [R] check
exercises.

At 100 TB scale a per-row HTTP hop is the anti-pattern the batch engine
exists to remove (SURVEY.md §3.1 step 4): pre-materialize the service's
output as a column (the ``documents.text`` fixture models exactly that)
and keep this source for the long-tail rows that genuinely need a live
call, sized by ``maxRecordsPerBatch`` so each partition's session is
amortized over thousands of rows.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

# transport(session, doc_id) -> raw JSON string of {"text": [sentence, ...]}
Transport = Callable[[object, int], str]


def fake_lang_detector(_session: object, doc_id: int) -> str:
    """Deterministic stand-in for the lang-detector service: echoes a
    sentence list derived only from doc_id (same envelope as the real
    service, worker.py:28)."""
    return json.dumps(
        {"text": [f"sentence {doc_id % 7} of doc {doc_id}", f"tail {doc_id % 3}"]}
    )


def requests_transport(base_uri: str, target: str, lang: str) -> Transport:
    """Real transport: GET {base_uri}/{target}/{id}?filter={lang} with a
    per-partition requests.Session (worker.py:24-27). Import-gated: the
    container has no requests/network, so this raises only when used."""

    def fetch(session: object, doc_id: int) -> str:
        if session is None:
            raise NotImplementedError(
                "requests is unavailable in this container; pass the fake "
                "transport, or deploy with requests installed"
            )
        return session.get(  # type: ignore[attr-defined]
            f"{base_uri}/{target}/{doc_id}", params={"filter": lang}, timeout=10
        ).text

    return fetch


def enrich_with_text(docs: DataFrame, transport: Transport = fake_lang_detector) -> DataFrame:
    """(doc_id, fetched_text) — per-row service lookup, one session per
    partition, sentences joined with ' ' exactly like worker.py:29."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition session init (UD1); None when requests is absent.
        try:
            import requests  # type: ignore

            session = requests.Session()
        except ImportError:
            session = None
        for pdf in batches:
            texts = [
                " ".join(json.loads(transport(session, int(i)))["text"])
                for i in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "fetched_text": texts})

    return docs.select("doc_id").mapInPandas(run, "doc_id long, fetched_text string")
