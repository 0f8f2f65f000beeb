"""Sources: species-list TSV (S1/S2), HTML scenario scrape (S3) with the
availability filter (F1), and the idempotency anti-join (D1)."""

from __future__ import annotations

from species_range_data_pipeline_spark.operators.idempotency import (
    materialized_keys,
    pending_work,
)
from species_range_data_pipeline_spark.sources.scrape import (
    parse_species_page,
    scrape_scenarios,
)
from species_range_data_pipeline_spark.sources.species_list import (
    fetch_species_list,
    read_species_list_csv,
)

TSV = (
    "abies-balsamea\tBalsam Fir\tAbies balsamea\tvtech\n"
    "acer-rubrum\tRed Maple\tAcer rubrum\tvtech\n"
)

PAGE = """
<html><body>
<div class="row">
  <div class="col-md-3 block"><h4>Current</h4>
    <ul><li><a href="/img/a.png">img</a></li>
        <li><a href="/zips/abies_25_current.zip">zip</a></li></ul>
  </div>
  <div class="col-md-3 block"><h4>GFDL RCP4.5 2080</h4>
    <ul><li><a href="/img/b.png">img</a></li>
        <li><a href="/zips/abies_25_gfdl_rcp45_y2080.zip">zip</a></li></ul>
  </div>
  <div class="col-md-3 block"><h4>HadGEM RCP8.5 2080</h4>
    <p>Image not available</p>
  </div>
</div>
</body></html>
"""


def test_species_list_fetch_and_schema(spark):
    df = fetch_species_list(spark, "https://example.invalid/speciesList.txt", lambda url: TSV)
    assert df.columns == ["hyphenated_name", "regular_name", "scientific_name", "source_site"]
    rows = df.orderBy("hyphenated_name").collect()
    assert [r.hyphenated_name for r in rows] == ["abies-balsamea", "acer-rubrum"]
    assert rows[0].scientific_name == "Abies balsamea"


def test_species_list_csv_path(spark, tmp_path):
    p = tmp_path / "speciesList.txt"
    p.write_text(TSV)
    df = read_species_list_csv(spark, str(p))
    assert df.count() == 2
    assert dict(df.dtypes) == {
        "hyphenated_name": "string",
        "regular_name": "string",
        "scientific_name": "string",
        "source_site": "string",
    }


def test_parse_species_page_selection_and_availability():
    got = parse_species_page(PAGE)
    assert got == [
        ("Current", "/zips/abies_25_current.zip", True),
        ("GFDL RCP4.5 2080", "/zips/abies_25_gfdl_rcp45_y2080.zip", True),
        ("HadGEM RCP8.5 2080", None, False),
    ]


# The live page's probable shape (ADVICE r7): each thumbnail-file-group
# block holds a NESTED -01 image-wrapper div BEFORE the -02 file
# sublist.  A block regex that stops at the first </div> truncates the
# block at the -01 wrapper's close and silently loses the zip link.
PAGE_NESTED_01 = """
<html><body>
<div class="thumbnail-file-group">
  <h4>Current</h4>
  <div class="thumbnail-file-group-01">
    <img src="/img/a_preview.png" alt="range map"/>
  </div>
  <div class="thumbnail-file-group-02">
    <ul><li><a href="/img/a.png">img</a></li>
        <li><a href="/zips/abies_25_current.zip">zip</a></li></ul>
  </div>
</div>
<div class="thumbnail-file-group">
  <h4>HadGEM RCP8.5 2080</h4>
  <div class="thumbnail-file-group-01"><p>Image not available</p></div>
</div>
</body></html>
"""


def test_parse_species_page_nested_image_wrapper():
    got = parse_species_page(PAGE_NESTED_01)
    assert got == [
        ("Current", "/zips/abies_25_current.zip", True),
        ("HadGEM RCP8.5 2080", None, False),
    ]


# ADVICE r8 low: the FINAL block must not swallow trailing page chrome —
# a footer "Image not available" string would flip the last scenario to
# unavailable, and footer links could be picked up as a zip url.
PAGE_TRAILING_CHROME = """
<html><body><main>
<div class="thumbnail-file-group">
  <h4>Current</h4>
  <div class="thumbnail-file-group-02">
    <ul><li><a href="/img/a.png">img</a></li>
        <li><a href="/zips/abies_25_current.zip">zip</a></li></ul>
  </div>
</div>
</main>
<footer>
  <p>Image not available in print view.</p>
  <ul><li><a href="/about">about</a></li>
      <li><a href="/contact">contact</a></li></ul>
</footer>
</body></html>
"""


def test_parse_species_page_trailing_chrome_bounded():
    got = parse_species_page(PAGE_TRAILING_CHROME)
    assert got == [("Current", "/zips/abies_25_current.zip", True)]


def test_parse_species_page_trailing_chrome_no_sublist():
    # without a -02 sublist the li-scan falls back to the whole block;
    # the block bound must still keep footer links out of it
    page = PAGE_TRAILING_CHROME.replace(
        '<div class="thumbnail-file-group-02">', "<div>"
    )
    got = parse_species_page(page)
    assert got == [("Current", "/zips/abies_25_current.zip", True)]


def test_scrape_scenarios_dataflow(spark):
    species = fetch_species_list(spark, "u", lambda url: TSV)
    fetched_urls = []

    def fetcher(url: str) -> str:
        fetched_urls.append(url)
        if "acer" in url:
            raise OSError("HTTP 503")
        return PAGE

    out = scrape_scenarios(species, fetcher).collect()
    ok = [r for r in out if r.error is None]
    errs = [r for r in out if r.error is not None]
    assert len(ok) == 3 and len(errs) == 1
    assert errs[0].species == "acer-rubrum" and "OSError" in errs[0].error
    # F1: the declarative availability filter drops the unavailable scenario
    available = [r for r in ok if r.available]
    assert len(available) == 2


def test_idempotency_anti_join(spark, tmp_path):
    work = spark.createDataFrame(
        [("a", "25"), ("a", "50"), ("b", "25")], "species string, threshold string"
    )
    done = spark.createDataFrame([("a", "50")], "species string, threshold string")
    pending = pending_work(work, done, ["species", "threshold"])
    assert {(r.species, r.threshold) for r in pending.collect()} == {("a", "25"), ("b", "25")}

    # sink listing: absent path -> empty keys -> everything pending
    empty = materialized_keys(spark, str(tmp_path / "nope"), ["species"])
    assert empty.count() == 0
    assert pending_work(work, empty, ["species"]).count() == 3


def test_python_datasource_species_list(spark, tmp_path):
    """Spark-4 Python data source: format('species_list') parses the TSV on
    executors across byte-range partitions; rows and schema must equal the
    driver-side parser on the same payload (incl. a ragged 2-field line)."""
    from species_range_data_pipeline_spark.sources.python_datasource import (
        register_species_list_source,
    )
    from species_range_data_pipeline_spark.sources.species_list import (
        read_species_list_text,
    )

    lines = [
        f"abies-balsamea-{i}\tBalsam fir {i}\tAbies balsamea\tvtech"
        for i in range(97)
    ] + ["picea-rubens\tRed spruce"]
    payload = "\n".join(lines) + "\n"
    p = tmp_path / "species.tsv"
    p.write_text(payload)

    register_species_list_source(spark)
    df = (
        spark.read.format("species_list")
        .option("path", str(p))
        .option("numPartitions", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() > 1
    want_df = read_species_list_text(spark, payload)
    assert df.schema == want_df.schema
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(tuple(r) for r in want_df.collect())
    assert got == want and len(got) == 98


def test_load_table_events_survives_foreign_session_conf(spark):
    """The external driver passes its OWN SparkSession (without our
    nanosAsLong conf): load_table must still read the TIMESTAMP(NANOS)
    events fixture and convert ts to a timestamp."""
    from species_range_data_pipeline_spark.catalog import load_table

    from .conftest import SF_SMOKE

    ns = spark.newSession()
    try:
        ns.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        ns.conf.set("spark.sql.session.timeZone", "America/New_York")
    except Exception:
        pass
    df = load_table(ns, SF_SMOKE, "events")
    assert dict(df.dtypes)["ts"].startswith("timestamp")
    assert df.count() > 0
    # the loader restored UTC rendering, so formatted bounds match the
    # oracle no matter what TZ the caller's session carried
    assert ns.conf.get("spark.sql.session.timeZone") == "UTC"
