from __future__ import annotations

import json
import os
import re

from data_governance_spark.fixtures import who_region_dim
from data_governance_spark.sinks.html_sink import (
    build_report,
    iso_code,
    write_country_reports,
)


def _metrics(spark):
    return spark.createDataFrame(
        [
            ("language", None, None, "en", 2020, 5),
            ("language", None, "Brazil", "pt", 2020, 3),
            ("doctype", None, "Brazil", "Articles", 2021, 2),
            ("doctype", None, "India", "Thesis", 2021, 1),
        ],
        "type string, region string, country string, name string, year int, count int",
    )


def test_build_report_embeds_charts(spark):
    html = build_report(
        _metrics(spark), ["language"], title="T", generated="2026-08-13"
    )
    payload = json.loads(re.search(r"const CHARTS = (.*);", html).group(1))
    # global slice (region IS NULL) includes both language rows
    assert payload == {"language": [{"ano": 2020, "en": 5, "pt": 3}]}
    assert "Generated 2026-08-13" in html


def test_iso_code_lookup(spark):
    assert iso_code(who_region_dim(spark), "Brazil") == "BR"
    assert iso_code(who_region_dim(spark), "Atlantis") is None


def test_write_country_reports(spark, tmp_path):
    paths = write_country_reports(
        _metrics(spark),
        who_region_dim(spark),
        ["doctype"],
        str(tmp_path),
        generated="2026-08-13",
    )
    names = sorted(os.path.basename(p) for p in paths)
    assert names == ["br.html", "in.html"]
    with open(os.path.join(str(tmp_path), "br.html")) as f:
        assert "Articles" in f.read()
