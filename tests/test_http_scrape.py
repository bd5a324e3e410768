"""S8 HTTP directory scrape — injected-fetch tests (no sockets):
node discovery off anchor TEXT with natural sort, skip-whole-node on
missing files, retry + partial-file cleanup on failure."""

from __future__ import annotations

import pytest

from stampede_to_fresco_etl_spark.sources.http_scrape import (
    discover_nodes,
    download_file,
    required_file_urls,
    scrape_to_landing,
)

INDEX = """
<html><body>
<a href="NODE10/">NODE10/</a>
<a href="NODE2/">NODE2/</a>
<a href="sub/NODE1/">NODE1/</a>
<a href="misc/">misc/</a>
<a href="NODE3">NODE3</a>   <!-- no trailing slash in text: not a node -->
</body></html>
"""

NODE_FULL = """
<a href="block.csv">block.csv</a><a href="cpu.csv">cpu.csv</a>
<a href="llite.csv">llite.csv</a><a href="mem.csv">mem.csv</a>
<a href="extra.log">extra.log</a>
"""

NODE_PARTIAL = '<a href="block.csv">block.csv</a><a href="cpu.csv">cpu.csv</a>'


def make_fetch(pages: dict[str, bytes], fail: dict[str, int] | None = None):
    """Fake fetcher: serves `pages`, failing `fail[url]` times first."""
    fail = dict(fail or {})
    calls = []

    def fetch(url: str) -> bytes:
        calls.append(url)
        if fail.get(url, 0) > 0:
            fail[url] -= 1
            raise IOError(f"transient: {url}")
        if url not in pages:
            raise IOError(f"404: {url}")
        return pages[url]

    fetch.calls = calls  # type: ignore[attr-defined]
    return fetch


BASE = "http://example.test/stampede/"


def test_discover_nodes_text_match_and_natural_sort():
    fetch = make_fetch({BASE: INDEX.encode()})
    nodes = discover_nodes(BASE, fetch=fetch, wait=0)
    # matched on TEXT (NODE1's href lives under sub/), natural order
    assert [n for n, _ in nodes] == ["NODE1", "NODE2", "NODE10"]
    assert dict(nodes)["NODE1"] == BASE + "sub/NODE1/"
    assert all(u.endswith("/") for _, u in nodes)


def test_required_files_skip_whole_node():
    full = BASE + "NODE2/"
    partial = BASE + "NODE1/"
    fetch = make_fetch(
        {full: NODE_FULL.encode(), partial: NODE_PARTIAL.encode()}
    )
    urls = required_file_urls(full, fetch=fetch, wait=0)
    assert set(urls) == {"block.csv", "cpu.csv", "llite.csv", "mem.csv"}
    assert urls["mem.csv"] == full + "mem.csv"
    assert required_file_urls(partial, fetch=fetch, wait=0) is None


def test_download_retries_then_succeeds(tmp_path):
    url = BASE + "NODE2/cpu.csv"
    fetch = make_fetch({url: b"a,b\n1,2\n"}, fail={url: 2})
    dest = tmp_path / "NODE2" / "cpu.csv"
    assert download_file(url, dest, fetch=fetch, retries=3, wait=0)
    assert dest.read_bytes() == b"a,b\n1,2\n"
    assert len(fetch.calls) == 3  # two failures + success


def test_download_exhausted_retries_cleans_partial(tmp_path):
    url = BASE + "NODE2/mem.csv"
    dest = tmp_path / "mem.csv"
    dest.write_bytes(b"stale partial")
    fetch = make_fetch({}, fail={url: 99})
    with pytest.raises(IOError):
        download_file(url, dest, fetch=fetch, retries=3, wait=0)
    assert not dest.exists()  # half-written file never reaches ingest


def test_scrape_to_landing_end_to_end(tmp_path):
    pages = {
        BASE: INDEX.encode(),
        BASE + "sub/NODE1/": NODE_PARTIAL.encode(),  # missing 2 files
        BASE + "NODE2/": NODE_FULL.encode(),
        BASE + "NODE10/": NODE_FULL.encode(),
    }
    for node in ("NODE2", "NODE10"):
        for f in ("block.csv", "cpu.csv", "llite.csv", "mem.csv"):
            pages[BASE + f"{node}/{f}"] = f"{node}:{f}\n".encode()
    fetch = make_fetch(pages)
    out = scrape_to_landing(BASE, str(tmp_path), fetch=fetch, wait=0)
    assert out == {"downloaded": ["NODE2", "NODE10"], "skipped": ["NODE1"]}
    assert (tmp_path / "NODE2" / "cpu.csv").read_text() == "NODE2:cpu.csv\n"
    assert (tmp_path / "NODE10" / "mem.csv").read_text() == "NODE10:mem.csv\n"
    assert not (tmp_path / "NODE1").exists()
