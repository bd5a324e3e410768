"""S8 — HTTP directory-index acquisition (the reference's scrape
stage, step-1/transformer.py:43-177), stdlib-only and injectable.

The reference walks an Apache-style HTML index: the base page lists
per-node directories as anchors whose TEXT matches ``NODE\\d+/``; each
node page lists the four per-node metric CSVs; files download with
retry + partial-file cleanup + non-empty validation.  Semantics kept:

  - node discovery matches on the anchor's visible text (not the
    href) and natural-sorts by the numeric suffix, so NODE2 < NODE10
    (transformer.py:75-89);
  - per-node file resolution requires ALL required files; a node
    missing any is skipped whole (returns None — transformer.py:121);
  - downloads retry ``retries`` times with a fixed wait, remove the
    partial file on failure, and treat an empty body as failure
    (transformer.py:130-177).

This is driver-side acquisition, deliberately OUTSIDE the Spark data
plane (SURVEY §2.1): it lands files into a directory that
`streaming/ingest.read_event_stream` or the batch readers then scan.
At scale the landing dir is the cluster-visible staging bucket and
this module runs in the orchestrator, not on executors — scraping an
HTTP index from 1000 executors would be a self-inflicted DDoS.

`fetch` is injectable (any ``url -> bytes`` callable) so tests — and
air-gapped deployments with a different transport — run without
sockets; the default uses urllib with a timeout.
"""

from __future__ import annotations

import re
import time
import urllib.request
from html.parser import HTMLParser
from pathlib import Path
from typing import Callable

NODE_DIR_PATTERN = re.compile(r"^(NODE\d+)/$")
REQUIRED_FILES = ("block.csv", "cpu.csv", "llite.csv", "mem.csv")
DEFAULT_RETRIES = 3
DEFAULT_WAIT_SECONDS = 3.0
DEFAULT_TIMEOUT = 60.0


def default_fetch(url: str, timeout: float = DEFAULT_TIMEOUT) -> bytes:
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.read()


class _AnchorParser(HTMLParser):
    """Collect (text, href) for every <a href=...> in an index page —
    the stdlib stand-in for the reference's soup.find_all('a')."""

    def __init__(self) -> None:
        super().__init__()
        self._href: str | None = None
        self._text: list[str] = []
        self.anchors: list[tuple[str, str]] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._flush()
            self._href = dict(attrs).get("href")
            self._text = []

    def handle_data(self, data):
        if self._href is not None:
            self._text.append(data)

    def handle_endtag(self, tag):
        if tag == "a":
            self._flush()

    def _flush(self):
        if self._href is not None:
            self.anchors.append(("".join(self._text).strip(), self._href))
            self._href = None
            self._text = []

    def close(self):
        super().close()
        self._flush()


def parse_anchors(html: str) -> list[tuple[str, str]]:
    p = _AnchorParser()
    p.feed(html)
    p.close()
    return p.anchors


def _urljoin(base: str, href: str) -> str:
    from urllib.parse import urljoin

    return urljoin(base, href)


def _retrying(fn, retries: int, wait: float):
    last: Exception | None = None
    for attempt in range(retries):
        try:
            return fn()
        except Exception as e:  # the reference retries any transport error
            last = e
            if attempt + 1 < retries:
                time.sleep(wait)
    raise last  # type: ignore[misc]


def discover_nodes(
    base_url: str,
    fetch: Callable[[str], bytes] = default_fetch,
    retries: int = DEFAULT_RETRIES,
    wait: float = DEFAULT_WAIT_SECONDS,
) -> list[tuple[str, str]]:
    """(node_name, node_url) for every anchor whose TEXT is NODE<n>/,
    natural-sorted by n (NODE2 before NODE10)."""
    html = _retrying(
        lambda: fetch(base_url), retries, wait
    ).decode("utf-8", "replace")
    nodes = []
    for text, href in parse_anchors(html):
        m = NODE_DIR_PATTERN.match(text)
        if m:
            url = _urljoin(base_url, href)
            if not url.endswith("/"):
                url += "/"
            nodes.append((m.group(1), url))
    nodes.sort(key=lambda x: int(re.search(r"\d+", x[0]).group()))
    return nodes


def required_file_urls(
    node_url: str,
    required: tuple[str, ...] = REQUIRED_FILES,
    fetch: Callable[[str], bytes] = default_fetch,
    retries: int = DEFAULT_RETRIES,
    wait: float = DEFAULT_WAIT_SECONDS,
) -> dict[str, str] | None:
    """filename → url for the node, or None when ANY required file is
    missing (the node is skipped whole, matching the reference)."""
    html = _retrying(
        lambda: fetch(node_url), retries, wait
    ).decode("utf-8", "replace")
    urls = {}
    for text, href in parse_anchors(html):
        if text in required:
            urls[text] = _urljoin(node_url, href)
    if set(required) - set(urls):
        return None
    return urls


def download_file(
    url: str,
    destination: Path,
    fetch: Callable[[str], bytes] = default_fetch,
    retries: int = DEFAULT_RETRIES,
    wait: float = DEFAULT_WAIT_SECONDS,
) -> bool:
    """Download with retries; partial/empty results are removed, never
    left for the ingest scan to pick up half-written."""
    destination.parent.mkdir(parents=True, exist_ok=True)

    def attempt() -> bool:
        try:
            body = fetch(url)
        except Exception:
            if destination.exists():
                destination.unlink()
            raise
        if not body:
            if destination.exists():
                destination.unlink()
            return False
        destination.write_bytes(body)
        return True

    return _retrying(attempt, retries, wait)


def scrape_to_landing(
    base_url: str,
    landing_dir: str,
    required: tuple[str, ...] = REQUIRED_FILES,
    fetch: Callable[[str], bytes] = default_fetch,
    retries: int = DEFAULT_RETRIES,
    wait: float = DEFAULT_WAIT_SECONDS,
) -> dict[str, list[str]]:
    """Full S8 pass: discover nodes, resolve each node's required
    files, download into ``landing_dir/<node>/<file>``.  Returns
    {"downloaded": [node, ...], "skipped": [node, ...]} — skipped
    nodes are those missing any required file, matching the
    reference's skip-whole-node rule."""
    downloaded, skipped = [], []
    for node, node_url in discover_nodes(base_url, fetch, retries, wait):
        urls = required_file_urls(node_url, required, fetch, retries, wait)
        if urls is None:
            skipped.append(node)
            continue
        for fname, url in urls.items():
            download_file(
                url, Path(landing_dir) / node / fname, fetch, retries, wait
            )
        downloaded.append(node)
    return {"downloaded": downloaded, "skipped": skipped}
