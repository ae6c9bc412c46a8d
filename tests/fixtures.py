"""Reference-shaped synthetic fixtures (FIXTURES.md §A), seed=42.

Mirrors the inputs of the reference pipeline: a filings corpus with
per-CIK report dates, a deals CSV with 2-digit-year announce dates
(`join_acquirers.scala:20-21`), a company master, and a stop-word
list. Deterministic so the end-to-end test is replayable.
"""

from __future__ import annotations

import datetime as dt
import random

VOCAB = (
    "merger acquisition revenue growth risk market segment liquidity "
    "earnings guidance product pipeline restructuring synergy capital "
    "dividend outlook competition regulation litigation technology"
).split()

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def make_fixtures(n_companies: int = 40, filings_per_company: int = 6, seed: int = 42):
    rng = random.Random(seed)
    companies = []
    for i in range(n_companies):
        companies.append(
            {
                "cik": f"{100000 + i}",
                "ticker": f"TK{i:03d}",
                "name": f"Company {i:03d} Inc",
                "sic": str(rng.choice([3711, 3714, 7372, 7375, 2834, 2836, 6021, 6022])),
                "exchange": rng.choice(["NYSE", "NASDAQ"]),
                "business": "synthetic",
                "incorporated": "DE",
                "irs": f"{rng.randrange(10**8, 10**9)}",
            }
        )
    # a few master rows with no filings + a name-variant that must NOT link
    companies.append(
        {
            "cik": "999999",
            "ticker": "ZZZ",
            "name": "company 000 inc",  # lowercase variant: exact-equality linkage misses it
            "sic": "3711",
            "exchange": "NYSE",
            "business": "synthetic",
            "incorporated": "DE",
            "irs": "123456789",
        }
    )

    filings = []
    base = dt.date(2015, 1, 1)
    for i in range(n_companies):
        for q in range(filings_per_company):
            report = base + dt.timedelta(days=rng.randrange(0, 1400))
            words = [rng.choice(VOCAB) for _ in range(rng.randrange(100, 200))]
            # salt in stopwords so removal is observable
            for _ in range(20):
                words.insert(rng.randrange(len(words)), rng.choice(STOPWORDS))
            text = " ".join(words)
            if i == 7 and q == 0:
                text = "  !!! 123 ...  "  # cleans to empty: exercises P6
            filings.append(
                {"cik": f"{100000 + i}", "report_date": report, "text": text}
            )

    deals = []
    for i in range(0, n_companies, 3):  # every 3rd company is an acquirer
        announce = base + dt.timedelta(days=rng.randrange(100, 1500))
        deals.append(
            {
                "acquirer_name": f"Company {i:03d} Inc",
                "target_name": f"Company {(i + 1) % n_companies:03d} Inc",
                "announce_date": announce.strftime("%m/%d/%y"),
                "deal_type": "merger",
                "seller_name": "",
                "announced_total_value_mil": round(rng.uniform(10, 5000), 2),
                "payment_type": rng.choice(["cash", "stock"]),
                "deal_status": "completed",
            }
        )
    # one company acquired twice + one name with no master match
    deals.append(dict(deals[0], target_name=deals[0]["target_name"]))
    deals.append(dict(deals[0], acquirer_name="No Such Company LLC"))
    return companies, filings, deals
