#!/usr/bin/env python
"""Deterministic GDELT-shaped TSV fixtures for the oracle-gated
reader-path queries (mention_stats, gkg_theme_daily).

Regenerate with  python scripts/gen_gdelt_fixtures.py  — output is
byte-stable (seeded PRNG, fixed formats), so the checked-in fixtures
under tests/fixtures/gdelt/ only change when this script changes.

Shapes follow the public GDELT 2.0 codebooks (the same column sets as
reference/extractor/schema.py:1-65 and :128-147, and the public V2 GKG
codebook): 61-col v2 export, 16-col mentions, 27-col GKG.  Fields are
plain ASCII with no tabs/quotes/empty strings so the Spark csv reader
and DuckDB read_csv parse byte-identically (empty-string → NULL rules
differ between engines; the fixtures sidestep that by never emitting
empty fields).
"""

from __future__ import annotations

import datetime as dt
import os
import random

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "gdelt")

N_EVENTS = 2000
N_GKG = 1500
BASE = dt.datetime(2024, 2, 10, 0, 0, 0)

THEME_POOL = [
    "TAX_ECON", "TAX_HEALTH", "ENV_CLIMATE", "WB_632_FINANCE",
    "EPU_POLICY", "TAX_MILITARY", "SOC_POINTSOFINTEREST", "TAX_TRADE",
    "CRISISLEX_CRISIS", "TAX_DISASTER", "MEDIA_MSM", "TAX_RELIGION",
    "GOV_ELECTION", "TAX_PROTEST", "SCI_TECH",
]

ACTOR_CODES = ["GOV", "MIL", "BUS", "CVL", "EDU", "MED", "JUD", "OPP"]
COUNTRIES = ["USA", "CHN", "RUS", "FRA", "GBR", "DEU", "IND", "BRA"]
ROOTS = ["01", "02", "04", "10", "14", "17", "19", "20"]


def ts14(t: dt.datetime) -> str:
    return t.strftime("%Y%m%d%H%M%S")


def gen_events(rng: random.Random) -> tuple[list[list[str]], dict[int, dt.datetime]]:
    rows, when = [], {}
    for i in range(N_EVENTS):
        gid = 1000 + i
        t = BASE + dt.timedelta(minutes=15 * (i % 480), days=i // 480)
        when[gid] = t
        day = t.strftime("%Y%m%d")
        root = ROOTS[i % len(ROOTS)]
        base = root + str(i % 10)
        code = base + str(i % 4)
        actor = lambda k: [  # noqa: E731 — 10 actor cols
            ACTOR_CODES[(i + k) % len(ACTOR_CODES)],
            f"ACTOR {1000 + (i + k) % 97}",
            COUNTRIES[(i + k) % len(COUNTRIES)],
            "KG" + str((i + k) % 5),
            "ET" + str((i + k) % 7),
            "REL" + str((i + k) % 3),
            "REL" + str((i + k) % 4),
            ACTOR_CODES[(i + 2 * k) % len(ACTOR_CODES)],
            "T2" + str((i + k) % 6),
            "T3" + str((i + k) % 2),
        ]
        geo = lambda k: [  # noqa: E731 — 8 geo cols (adm2)
            str(1 + (i + k) % 5),
            f"City {(i + k) % 50}, State, Country",
            COUNTRIES[(i + k) % len(COUNTRIES)][:2],
            "AD" + str((i + k) % 30),
            "ADM2" + str((i + k) % 12),
            f"{((i * 37 + k * 11) % 1800) / 10 - 90:.4f}",
            f"{((i * 53 + k * 17) % 3600) / 10 - 180:.4f}",
            "F" + str(100000 + (i + k) % 9999),
        ]
        rows.append(
            [str(gid), day, day[:6], day[:4], f"{int(day[:4]) + (i % 365) / 365:.4f}"]
            + actor(0)
            + actor(1)
            + [
                str(i % 2),
                code,
                base,
                root,
                str(1 + i % 4),
                f"{(i % 201) / 10 - 10:.1f}",
                str(1 + i % 40),
                str(1 + i % 12),
                str(1 + i % 30),
                f"{(i % 2001) / 100 - 10:.2f}",
            ]
            + geo(0)
            + geo(1)
            + geo(2)
            # the last 500 events repeat an earlier event's URL (host
            # period 20 divides the path period 1500) so the keep-first
            # SOURCEURL dedup (process_gdelt_events) has real
            # duplicates to drop
            + [ts14(t), f"http://site{i % 20}.example.com/articles/{1000 + i % 1500}"]
        )
    return rows, when


def gen_mentions(
    rng: random.Random, when: dict[int, dt.datetime]
) -> list[list[str]]:
    rows = []
    for gid, t in when.items():
        # ~15% of events get no mention rows (left-join coverage)
        n = 0 if rng.random() < 0.15 else rng.randint(1, 6)
        for j in range(n):
            lag_min = rng.randint(0, 2880)  # up to 2 days late
            mt = t + dt.timedelta(minutes=lag_min)
            src = f"site{rng.randint(0, 40)}.example.com"
            rows.append(
                [
                    str(gid),
                    ts14(t),
                    ts14(mt),
                    str(1 + j % 3),
                    src,
                    f"http://{src}/mention/{gid}-{j}",
                    str(j),
                    str(100 + 13 * j),
                    str(200 + 17 * j),
                    str(300 + 19 * j),
                    str(j % 2),
                    str(10 * rng.randint(1, 10)),
                    str(500 + 97 * j),
                    f"{rng.randint(-1000, 1000) / 100:.2f}",
                    "srclc:eng" if j % 4 else "srclc:fra",
                    "-",
                ]
            )
    rows.sort(key=lambda r: (int(r[0]), r[2], r[5]))
    return rows


# (fips_code, full_name, lat, lon) pool for V2Locations blocks —
# country-level centroids, FIPS 2-char codes per the GKG codebook
GKG_LOCS = [
    ("US", "United States", 39.0, -98.0),
    ("CH", "China", 35.0, 105.0),
    ("RS", "Russia", 60.0, 100.0),
    ("FR", "France", 46.0, 2.0),
    ("UK", "United Kingdom", 54.0, -2.0),
    ("GM", "Germany", 51.0, 9.0),
    ("IN", "India", 20.0, 77.0),
    ("BR", "Brazil", -10.0, -55.0),
]


def gkg_v2_fields(i: int) -> tuple[str, str, str, str]:
    """V2Locations / V2Persons / V2Organizations / GCAM blocks for row
    ``i`` — derived from ``i`` alone (no rng draws) so adding them
    left every other fixture byte unchanged.  Formats follow the
    public V2.1 GKG codebook: locations are 8 '#'-fields
    (type#name#cc#adm1#lat#lon#featureid#offset), persons/orgs are
    'Name,offset;' lists, GCAM is a ','-list of 'dim:value'."""
    c0 = GKG_LOCS[i % 8]
    loc = [
        f"1#{c0[1]}#{c0[0]}#{c0[0]}00#{c0[2]:.1f}#{c0[3]:.1f}#{c0[0]}"
        f"#{100 + (i % 9) * 40}"
    ]
    if i % 3 == 0:
        c1 = GKG_LOCS[(i // 3) % 8]
        loc.append(
            f"4#{c1[1]} City#{c1[0]}#{c1[0]}01#{c1[2] + 0.5:.1f}"
            f"#{c1[3] + 0.5:.1f}#F{i % 50}#{500 + (i % 5) * 20}"
        )
    persons = (
        f"Person {i % 60},{100 + (i % 9) * 10};"
        f"Person {(i * 7) % 60},{300 + (i % 4) * 10}"
    )
    orgs = f"Org {i % 30},{150 + (i % 6) * 10}"
    if i % 4 == 0:
        orgs += f";Org {(i * 11) % 30},400"
    gcam = (
        f"wc:{100 + i % 900},c2.1:{i % 7},c12.10:{(i * 3) % 11},"
        f"v10.1:{(i % 100) / 10:.2f}"
    )
    return ";".join(loc), persons, orgs, gcam


def gkg_v21_tail_fields(i: int) -> tuple[str, str, str, str]:
    """Quotations / RelatedImages / Amounts / TranslationInfo blocks
    for row ``i`` — again derived from ``i`` alone so adding them
    left every other fixture byte unchanged.  Formats follow the
    public V2.1 codebook: Quotations are ';'-separated
    'offset#length#verb#quote' (quote may contain commas; verb may be
    empty), RelatedImages is a ';'-URL list, Amounts is
    'amount,object,offset;', TranslationInfo is 'srclc:xxx;eng:...'.
    RelatedImages deliberately reuses ANOTHER record's SharingImage
    URL (record (i*3) % N_GKG) so cross-record duplicate image URLs
    exist for the multimodal dedup chain."""
    if i % 2 == 0:
        quotes = [
            f"{120 + (i % 9) * 15}#{30 + (i % 6) * 5}#said"
            f"#We will act on issue {i % 40}, very soon"
        ]
        if i % 10 == 0:
            quotes.append(f"{600 + (i % 4) * 10}#25##This cannot stand {i % 13}")
        quotations = ";".join(quotes)
    else:
        quotations = "-"
    if i % 3 == 0:
        j = (i * 3) % N_GKG
        related = (
            f"http://site{j % 25}.example.com/img/{j}.jpg;"
            f"http://site{i % 25}.example.com/img/r{i}.jpg"
        )
    else:
        related = "-"
    amounts = f"{2 + i % 9},protesters,{100 + (i % 7) * 10}"
    if i % 4 == 0:
        amounts += f";{1000 + (i * 13) % 5000},dollars,{400 + (i % 3) * 25}"
    translation = "srclc:fra;eng:Moses 2.1.1" if i % 6 == 0 else "-"
    return quotations, related, amounts, translation


COUNT_TYPES = ["KILL", "ARREST", "PROTEST", "WOUND", "EVACUATE"]


def gkg_count_fields(i: int) -> tuple[str, str]:
    """Counts / V2Counts blocks for row ``i`` (V2.1 codebook:
    'Type#Count#ObjectType#LocType#FullName#CC#ADM1#Lat#Long#FeatureID'
    — 10 '#'-fields; V2Counts appends '#offset').  Derived from ``i``
    alone; '-' for odd rows so NULL/empty-marker paths stay covered."""
    if i % 2 != 0:
        return "-", "-"
    c = GKG_LOCS[i % 8]
    blocks = []
    for j in range(1 + (i % 10 == 0)):  # second block every 10th row
        ctype = COUNT_TYPES[(i // 2 + j) % len(COUNT_TYPES)]
        cnt = 1 + (i + 7 * j) % 40
        obj = "people" if (i + j) % 3 else "civilians"
        blocks.append(
            f"{ctype}#{cnt}#{obj}#1#{c[1]}#{c[0]}#{c[0]}00"
            f"#{c[2]:.1f}#{c[3]:.1f}#{c[0]}"
        )
    counts = ";".join(blocks)
    v2counts = ";".join(
        f"{b}#{200 + (i % 9) * 10 + 5 * j}" for j, b in enumerate(blocks)
    )
    return counts, v2counts


def gen_gkg(rng: random.Random) -> list[list[str]]:
    rows = []
    for i in range(N_GKG):
        t = BASE + dt.timedelta(minutes=30 * (i % 192), days=i // 400)
        rid = f"{ts14(t)}-{i}"
        k = rng.randint(2, 5)
        themes = [THEME_POOL[rng.randrange(len(THEME_POOL))] for _ in range(k)]
        if i % 9 == 0:
            themes.append(themes[0])  # duplicate tag: exercises array_distinct
        tone = rng.randint(-900, 900) / 100
        v2tone = (
            f"{tone:.2f},{abs(tone) / 2:.2f},{abs(tone) / 3:.2f},"
            f"{rng.randint(0, 500) / 100:.2f},{rng.randint(0, 80)},"
            f"{rng.randint(0, 20)},{100 + i % 900}"
        )
        src = f"site{i % 25}.example.com"
        v2loc, v2pers, v2orgs, gcam = gkg_v2_fields(i)
        quotations, related, amounts, translation = gkg_v21_tail_fields(i)
        counts, v2counts = gkg_count_fields(i)
        rows.append(
            [
                rid,
                ts14(t),
                "1",
                src,
                f"http://{src}/gkg/{i}",
                counts,
                v2counts,
                ";".join(themes) + ";",
                ";".join(f"{th},{j * 100}" for j, th in enumerate(themes)) + ";",
                "1#Country#CO#CO01#10.5#-74.2#F1",
                v2loc,
                f"person {i % 60};person {(i * 7) % 60}",
                v2pers,
                f"org {i % 30}",
                v2orgs,
                v2tone,
                "-",
                gcam,
                f"http://{src}/img/{i}.jpg",
                related,
                "-",
                "-",
                quotations,
                f"Name {i % 80},123;Name {(i * 3) % 80},456",
                amounts,
                translation,
                "-",
            ]
        )
    return rows


def write_tsv(name: str, rows: list[list[str]]) -> None:
    path = os.path.join(OUT, name)
    with open(path, "w", encoding="ascii", newline="\n") as f:
        for r in rows:
            assert all("\t" not in c and '"' not in c and c != "" for c in r), r
            f.write("\t".join(r) + "\n")
    print(f"{path}: {len(rows)} rows x {len(rows[0])} cols")


def v1_from_v2(events: list[list[str]]) -> list[list[str]]:
    """58-col v1 rows derived from the 61-col v2 rows: identical
    except the three Geo_ADM2Code columns (absolute indices 39, 47,
    55 — the 5th column of each 8-col geo block) do not exist in the
    v1 layout.  Deriving keeps the two fixtures value-consistent and
    the generator byte-stable."""
    return [[c for j, c in enumerate(r) if j not in (39, 47, 55)] for r in events]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(20240210)
    events, when = gen_events(rng)
    write_tsv("v2_events.tsv", events)
    write_tsv("v1_events.tsv", v1_from_v2(events))
    write_tsv("v2_mentions.tsv", gen_mentions(rng, when))
    write_tsv("v2_gkg.tsv", gen_gkg(rng))


if __name__ == "__main__":
    main()
