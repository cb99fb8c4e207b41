"""Pluggable fetch stage (SURVEY.md §2.1 S4 / §2.3 J4).

The reference downloads over HTTP (Scrapy downloader, 15s/15MB bounds).  In
Spark the fetch stage is a DataFrame -> DataFrame operator appending
``html:binary`` and ``lang:string`` to the politeness-selected batch
(null html == fetch miss / 404):

  * ``TableFetcher`` — resolves URLs against a pages table via a join whose
    big side is partitioned once on the key.  Right shape for re-processing
    a stored corpus (WARC/CommonCrawl re-crawls), but costs a corpus scan
    per round.
  * ``GeneratorFetcher`` — the live-crawl shape: a ``mapInPandas`` batch
    client whose cost is proportional to the BATCH, not the corpus.  In
    production the body of ``_fetch_batch`` is an async HTTP client pool
    (bounded per-partition concurrency, 15s timeout, 15MB cap, no retry per
    settings/common.py:22-27); in this sandbox it "fetches" from the
    deterministic synthetic web by reconstructing pages from the URL
    (webgen.build_page is a pure function of the URL), which models network
    fetch cost-behavior exactly.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import udfs


@dataclass(frozen=True)
class FetchPolicy:
    """Downloader bounds mirroring the reference's Scrapy settings
    (settings/common.py:16,22-27): 15 s timeout, 15 MB cap, identified
    user-agent, bounded concurrency, NO retry."""

    timeout_s: float = 15.0  # DOWNLOAD_TIMEOUT
    max_bytes: int = 15_728_640  # DOWNLOAD_MAXSIZE
    user_agent: str = "usasearch"  # USER_AGENT
    max_concurrency: int = 20  # REACTOR_THREADPOOL_MAXSIZE analog, per partition


class _UrllibTransport:
    """stdlib HTTP transport: ``urllib.request`` driven on the event loop's
    default thread-pool executor.  The production fallback when aiohttp is
    absent — a REAL network path (loopback-integration-tested in
    tests/test_http_loopback.py), not a stub.  Enforces the byte cap DURING
    the chunked read, like the aiohttp path; non-2xx raises HTTPError which
    the fetch wrapper turns into a downloader miss (html NULL, no retry)."""

    async def __call__(self, url: str, policy: FetchPolicy):
        import asyncio
        import urllib.request

        def get():
            req = urllib.request.Request(url, headers={"User-Agent": policy.user_agent})
            with urllib.request.urlopen(req, timeout=policy.timeout_s) as resp:
                body = bytearray()
                while True:
                    chunk = resp.read(1 << 16)
                    if not chunk:
                        break
                    body.extend(chunk)
                    if len(body) > policy.max_bytes:
                        return resp.status, dict(resp.headers), None
                return resp.status, dict(resp.headers), bytes(body)

        return await asyncio.get_running_loop().run_in_executor(None, get)


def _default_transport_factory() -> Callable:
    """Real aiohttp transport when the library exists; otherwise the stdlib
    urllib transport (thread-pool-driven) — both real network paths.
    Injectable so tests and replays supply fakes."""
    try:
        import aiohttp  # noqa: F401
    except ImportError:
        return _UrllibTransport()

    class _AiohttpTransport:  # pragma: no cover - requires network
        """Lazily opens one ClientSession on the event loop that first calls
        it; HttpFetcher drives ALL batches of a partition on a single loop,
        so the session stays bound to a live loop, and ``aclose`` releases
        it before the loop shuts down."""

        def __init__(self):
            self._session = None

        async def __call__(self, url: str, policy: FetchPolicy):
            import aiohttp

            if self._session is None:
                self._session = aiohttp.ClientSession(
                    headers={"User-Agent": policy.user_agent},
                    timeout=aiohttp.ClientTimeout(total=policy.timeout_s),
                )
            async with self._session.get(url) as resp:
                # enforce the byte cap DURING streaming, as Scrapy cancels
                # oversize downloads mid-flight
                body = bytearray()
                async for chunk in resp.content.iter_chunked(1 << 16):
                    body.extend(chunk)
                    if len(body) > policy.max_bytes:
                        return resp.status, dict(resp.headers), None
                return resp.status, dict(resp.headers), bytes(body)

        async def aclose(self):
            if self._session is not None:
                await self._session.close()
                self._session = None

    return _AiohttpTransport()


class HttpFetcher:
    """Async batch HTTP client (S4) — the production live-fetch stage.

    ``mapInPandas`` over the politeness-selected batch: each partition
    builds ONE transport (``transport_factory()``, e.g. a session pool),
    fans the batch out under an asyncio semaphore, and applies the
    reference's downloader semantics (FetchPolicy): per-request timeout,
    15 MB response cap, and NO retry — any failure (timeout, transport
    error, non-200, oversize) yields ``html = NULL`` for that URL, exactly
    like a Scrapy downloader miss with RETRY_ENABLED=False
    (settings/common.py:22-27).

    The transport is an ``async callable(url, policy) -> (status_code,
    headers_dict, body_bytes)``; the factory must be picklable (it ships to
    executors), the transport it builds need not be.
    """

    def __init__(
        self,
        transport_factory: Callable[[], Callable] | None = None,
        policy: FetchPolicy = FetchPolicy(),
    ):
        self.transport_factory = transport_factory or _default_transport_factory
        self.policy = policy

    def fetch(self, selected: DataFrame) -> DataFrame:
        factory, policy = self.transport_factory, self.policy
        out_schema = T.StructType(
            list(selected.schema.fields)
            + [T.StructField("html", T.BinaryType()), T.StructField("lang", T.StringType())]
        )

        def _fetch_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import asyncio

            transport = factory()  # one client per partition

            async def one(url: str, sem: "asyncio.Semaphore"):
                async with sem:
                    try:
                        status, headers, body = await asyncio.wait_for(
                            transport(url, policy), policy.timeout_s
                        )
                    except Exception:  # timeout / transport error: no retry
                        return None, None
                if status != 200 or body is None or len(body) > policy.max_bytes:
                    return None, None
                lang = None
                for k, v in (headers or {}).items():
                    if str(k).lower() == "content-language":
                        lang = str(v).split(",")[0].strip() or None
                        break
                return bytes(body), lang

            async def run(urls: list[str]):
                sem = asyncio.Semaphore(policy.max_concurrency)
                return await asyncio.gather(*(one(u, sem) for u in urls))

            # ONE event loop for the whole partition: a transport that opens
            # a connection pool (e.g. aiohttp.ClientSession) on first use
            # stays bound to a live loop across Arrow batches, instead of
            # dying with the first batch's asyncio.run loop.
            loop = asyncio.new_event_loop()
            try:
                for pdf in batches:
                    results = loop.run_until_complete(run(list(pdf["url_canon"]))) if len(pdf) else []
                    yield pdf.assign(
                        html=pd.Series([r[0] for r in results], index=pdf.index, dtype=object),
                        lang=pd.Series([r[1] for r in results], index=pdf.index, dtype=object),
                    )
            finally:
                aclose = getattr(transport, "aclose", None)
                if aclose is not None:
                    loop.run_until_complete(aclose())
                loop.close()

        return selected.mapInPandas(_fetch_batch, schema=out_schema)


class TableFetcher:
    """Fetch = left join against a canonical-keyed pages table."""

    def __init__(self, pages: DataFrame, partitions: int):
        self.pages = (
            pages.withColumn("url_canon", udfs.canonicalize_url(F.col("url")))
            .select("url_canon", "html", "lang")
            .repartition(partitions, "url_canon")
            .persist()
        )
        self.pages.count()  # materialize once

    def fetch(self, selected: DataFrame) -> DataFrame:
        return selected.join(self.pages, "url_canon", "left")


class GeneratorFetcher:
    """Live-fetch shape: per-partition batch client over the synthetic web."""

    def __init__(self, n_pages: int, n_hosts: int, branch: int = 3):
        from ..synth import webgen

        self.sizes = webgen.host_sizes(n_pages, n_hosts)
        self.n_hosts = n_hosts
        self.branch = branch

    def fetch(self, selected: DataFrame) -> DataFrame:
        from ..synth import webgen

        sizes, n_hosts, branch = self.sizes, self.n_hosts, self.branch
        out_schema = T.StructType(
            list(selected.schema.fields)
            + [T.StructField("html", T.BinaryType()), T.StructField("lang", T.StringType())]
        )

        def _fetch_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # production: open an async HTTP session here, fan out the batch
            for pdf in batches:
                htmls: list[bytes | None] = []
                langs: list[str | None] = []
                for url in pdf["url_canon"]:
                    hk = webgen.url_to_hk(url)
                    if hk is None or hk[0] >= n_hosts or hk[1] >= sizes[hk[0]]:
                        htmls.append(None)
                        langs.append(None)
                        continue
                    h, k = hk
                    row = webgen.build_page(h, k, sizes[h], n_hosts, branch, with_text=False)
                    htmls.append(row["html"])
                    langs.append(row["lang"])
                yield pdf.assign(html=pd.Series(htmls, index=pdf.index, dtype=object),
                                 lang=pd.Series(langs, index=pdf.index, dtype=object))

        return selected.mapInPandas(_fetch_batch, schema=out_schema)
