"""Live-HTTP integration for the scrape/download lanes (VERDICT r5 #8 /
r6 #8): a real ``http.server`` on an ephemeral localhost port serves the
reference pipeline's exact surfaces —

- the tab-separated species list (``species_range_etl.py:31-46``),
- a species page in the LIVE page's structure: ``<div
  class="thumbnail-file-group">`` blocks, an ``<h4>`` scenario title, the
  "Image not available" skip marker, and the zip link as the SECOND
  ``<li><a>`` of the ``thumbnail-file-group-02`` sublist
  (``species_range_etl.py:142-154``),
- the scenario zip payloads themselves.

The engine chain S1 -> S3 -> F1 -> S4 -> T1 -> T3 then runs against that
server with a plain urllib fetcher — the injectable-fetcher seam the unit
tests stub is exercised here with genuine sockets end-to-end.
"""

from __future__ import annotations

import io
import threading
import urllib.request
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pyspark.sql import functions as F

TSV = (
    "abies-balsamea\tbalsam fir\tAbies balsamea\tlittle\n"
    "acer-rubrum\tred maple\tAcer rubrum\tlittle\n"
)

_ASC = (
    "ncols 3\nnrows 2\nxllcorner 0.0\nyllcorner 0.0\ncellsize 1.0\n"
    "NODATA_value -9999\n10 20 30\n40 -9999 60\n"
)


def _zip_payload(species: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(f"{species}_pred_2080.txt", _ASC)
    return buf.getvalue()


def _species_page(species: str) -> str:
    # the reference's live structure, byte-shape faithful: an available
    # scenario whose SECOND <li> is the zip, plus an unavailable one
    return f"""<html><body>
<div class="thumbnail-file-group">
  <h4>GFDL 4.5 2080</h4>
  <div class="thumbnail-file-group-01">
    <img src="img/{species}_preview.png" alt="range map"/>
  </div>
  <div class="thumbnail-file-group-02">
    <ul>
      <li><a href="img/{species}.png">preview</a></li>
      <li><a href="files/{species}.zip">download</a></li>
    </ul>
  </div>
</div>
<div class="thumbnail-file-group">
  <h4>HadGEM 8.5 2080</h4>
  <p>Image not available</p>
  <div class="thumbnail-file-group-02"><ul>
    <li><a href="img/none.png">preview</a></li>
    <li><a href="files/none.zip">download</a></li>
  </ul></div>
</div>
</body></html>"""


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (stdlib API name)
        parts = self.path.strip("/").split("/")
        if self.path == "/speciesList.txt":
            body, ctype = TSV.encode(), "text/plain"
        elif parts[0] == "atlas" and len(parts) == 2:
            body, ctype = _species_page(parts[1]).encode(), "text/html"
        elif parts[0] == "files" and parts[-1].endswith(".zip"):
            sp = parts[-1].removesuffix(".zip")
            if sp == "none":
                self.send_error(404)
                return
            body, ctype = _zip_payload(sp), "application/zip"
        else:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture(scope="module")
def live_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        t.join(timeout=5)


def _get_text(url: str) -> str:
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read().decode()


def test_species_list_over_live_http(spark, live_server):
    from species_range_data_pipeline_spark.sources.species_list import (
        fetch_species_list,
    )

    df = fetch_species_list(spark, f"{live_server}/speciesList.txt", _get_text)
    rows = {r.hyphenated_name: r for r in df.collect()}
    assert set(rows) == {"abies-balsamea", "acer-rubrum"}
    assert rows["acer-rubrum"].scientific_name == "Acer rubrum"


def test_scrape_filter_fetch_expand_decode_over_live_http(spark, live_server):
    """The full reference download path against real sockets: scrape each
    species page, FILTER availability before any zip fetch (F1:
    predicate-before-fetch), download the zips inside the Spark lane,
    expand them, and decode the ASCII grid members."""
    from species_range_data_pipeline_spark.pipeline.raster import (
        decode_ascii_members,
        expand_zip,
    )
    from species_range_data_pipeline_spark.sources.scrape import (
        scrape_scenarios,
    )
    from species_range_data_pipeline_spark.sources.species_list import (
        fetch_species_list,
    )

    species = fetch_species_list(
        spark, f"{live_server}/speciesList.txt", _get_text
    )
    scenarios = scrape_scenarios(
        species, _get_text, url_template=f"{live_server}/atlas/{{species}}"
    )
    got = scenarios.orderBy("species", "scenario").collect()
    # 2 species x 2 scenarios; the "Image not available" one is filtered
    # out declaratively, never fetched
    assert len(got) == 4
    assert all(r.error is None for r in got)
    avail = scenarios.where(F.col("available"))
    assert avail.count() == 2
    assert {r.zip_url for r in avail.collect()} == {
        "files/abies-balsamea.zip",
        "files/acer-rubrum.zip",
    }

    # S4: fetch the zip binaries distributedly (mapInPandas over urls)
    import pandas as pd

    def fetch_fn(batches):
        for pdf in batches:
            out = []
            for sp, rel in zip(pdf["species"], pdf["zip_url"]):
                with urllib.request.urlopen(
                    f"{live_server}/{rel}", timeout=10
                ) as r:
                    out.append({"path": f"{sp}.zip", "content": r.read()})
            yield pd.DataFrame(out, columns=["path", "content"])

    archives = avail.select("species", "zip_url").mapInPandas(
        fetch_fn, "path string, content binary"
    )
    members = expand_zip(archives)
    cells = decode_ascii_members(members)
    per_file = (
        cells.where(F.col("error").isNull())
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    # each zip holds one 3x2 grid with one NODATA cell -> 5 live cells
    assert {r.file for r in per_file} == {
        "abies-balsamea_pred_2080.txt",
        "acer-rubrum_pred_2080.txt",
    }
    assert all(r.n == 5 and r.s == 160.0 for r in per_file)


def test_missing_zip_is_an_error_row_not_an_exception(spark, live_server):
    """A 404 mid-scrape surfaces as an error ROW (the reference's bare
    except at species_range_etl.py:170-173 swallows these silently)."""
    from species_range_data_pipeline_spark.sources.scrape import (
        scrape_scenarios,
    )

    bad = spark.createDataFrame(
        [("no-such-species",)], "hyphenated_name string"
    )
    out = scrape_scenarios(
        bad,
        _get_text,
        url_template=f"{live_server}/missing/{{species}}",
    ).collect()
    assert len(out) == 1
    assert out[0].error is not None and "404" in out[0].error
