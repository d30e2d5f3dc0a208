"""Worked end-to-end example: the reference README's spider, rebuilt.

The reference README (README.md:85-153) walks a jobs site: seed the
first list page, read "Showing page 1 of N" off it, enqueue list pages
2..N, parse every list page into job items, and store them to BOTH an
ETS table and a CSV with projected headers.  This script reproduces
that flow Spark-first on a deterministic synthetic corpus (no network,
no external data):

* seed with ``flag="first_page"`` (utils.ex set_flag analogue),
* a ``handle_response`` callback (CommonSpider callbacks-as-config,
  lib/spider_man.ex:64-85) that on the first page discovers N and
  fans out the remaining list pages, and on every page regex-parses
  the job entries into items,
* ``storage=["table", "csv:image_id,caption,epoch"]`` — the Multi
  fan-out of {ETS, CSV headers} from the README config.

Run:  PYTHONPATH=. python examples/readme_spider.py
"""

from __future__ import annotations

import re
import tempfile

import pandas as pd

from spider_man_spark.config import CrawlConfig
from spider_man_spark.plans.job import CrawlJob
from spider_man_spark.schemas import CORPUS_SCHEMA

TOTAL_PAGES = 5
JOBS_PER_PAGE = 4
BASE = "http://jobs.test"


def build_jobs_corpus(spark):
    """A deterministic mini jobs site shaped like CORPUS_SCHEMA: page 1
    carries the total-page marker the README spider scrapes; every
    page lists JOBS_PER_PAGE job anchors."""
    rows = []
    for page in range(1, TOTAL_PAGES + 1):
        jobs = "".join(
            f'<a class="offer" href="/jobs/{(page - 1) * JOBS_PER_PAGE + j}">'
            f"<strong>Title {(page - 1) * JOBS_PER_PAGE + j}</strong>"
            f"<small>Team {j}</small></a>"
            for j in range(JOBS_PER_PAGE)
        )
        marker = (
            f"<p>Showing page 1 of {TOTAL_PAGES}</p>" if page == 1 else ""
        )
        rows.append(
            (
                f"{BASE}/?page={page}",
                "jobs.test",
                200,
                "text/html",
                f"<html>{marker}{jobs}</html>".encode(),
                None,
                None,
                0,
                None,
            )
        )
    return spark.createDataFrame(rows, CORPUS_SCHEMA)


def make_handle_response():
    """README handle_response, pandas-batch form: first_page rows emit
    the 2..N list-page requests AND their own items; every row emits
    its page's job items (image_id = absolute link, caption = title).

    Built as a CLOSURE so cloudpickle ships it (and its regexes) BY
    VALUE to executor python workers — a module-level function would
    be pickled by reference and executors don't have examples/ on
    their import path (the same rule applies to any user callback that
    doesn't live in an installed package)."""
    total_re = re.compile(r"Showing page 1 of (\d+)")
    job_re = re.compile(
        r'<a class="offer" href="([^"]+)">'
        r"<strong>([^<]*)</strong><small>([^<]*)</small></a>"
    )
    base = BASE

    def handle_response(pdf: pd.DataFrame) -> pd.DataFrame:
        out: list[dict] = []
        for _, row in pdf.iterrows():
            body = bytes(row["body"]).decode()
            if row["flag"] == "first_page":
                total = int(total_re.search(body).group(1))
                for n in range(2, total + 1):
                    out.append(
                        {
                            "kind": "request",
                            "url": f"{base}/?page={n}",
                            "depth": int(row["depth"]) + 1,
                            "priority": 0,
                            "flag": f"list_page:{n}",
                            "options": None,
                            "image_id": None,
                            "bytes": None,
                            "caption": None,
                        }
                    )
            for link, title, _team in job_re.findall(body):
                out.append(
                    {
                        "kind": "item",
                        "url": row["url"],
                        "depth": int(row["depth"]),
                        "priority": 0,
                        "flag": None,
                        "options": None,
                        "image_id": base + link,
                        "bytes": None,
                        "caption": title,
                    }
                )
        return pd.DataFrame(
            out,
            columns=[
                "kind", "url", "depth", "priority", "flag", "options",
                "image_id", "bytes", "caption",
            ],
        )

    return handle_response


def run(spark, workdir: str) -> CrawlJob:
    cfg = CrawlConfig(
        workdir=workdir,
        tokens_per_epoch=10,
        callbacks={"handle_response": make_handle_response()},
        storage=["table", "csv:image_id,caption,epoch"],
    )
    job = CrawlJob(spark, cfg, corpus=build_jobs_corpus(spark))
    job.insert_requests([f"{BASE}/?page=1"], flag="first_page")
    job.run_until_zero(max_epochs=6)
    return job


if __name__ == "__main__":
    from spider_man_spark.session import get_spark

    spark = get_spark(
        "readme-spider", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    wd = tempfile.mkdtemp(prefix="readme_spider_")
    job = run(spark, wd)
    items = job.items()
    print(f"items stored: {items.count()} (expected "
          f"{TOTAL_PAGES * JOBS_PER_PAGE})")
    items.orderBy("image_id").show(8, truncate=False)
    print(f"state + sinks under: {wd}")
    spark.stop()
