"""Deterministic reference-shaped fixtures (FIXTURES.md §A; SURVEY.md §5).

Pure-Python seeded generator for the reference's source schemas
(customers / products / orders — generate_test_data.sh:44,76,113;
generate-test-data.scala:82-170), with the wall clock replaced by an
injected anchor date (SURVEY §0 Caveat C). Value domains follow the
reference: 80% active customers (scala:89), 8 categories with
per-category price ranges (scala:103,119-129), 85% in-stock (scala:131),
quantity 1..10 (scala:151), 40% of orders in the last 90 days
(scala:154-159), money cents-rounded (scala:133,167).
"""

from __future__ import annotations

import datetime as _dt
import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from demo_etl_spark import schemas
from demo_etl_spark.context import ANCHOR_DATE

CATEGORIES = [
    "Electronics", "Clothing", "Home Goods", "Books",
    "Toys", "Sports", "Food", "Beauty",
]
PRICE_RANGES = {
    "Electronics": (50.0, 1000.0), "Clothing": (10.0, 150.0),
    "Home Goods": (20.0, 300.0), "Books": (5.0, 30.0),
    "Toys": (8.0, 80.0), "Sports": (15.0, 250.0),
    "Food": (2.0, 40.0), "Beauty": (5.0, 60.0),
}
FIRST = ["Alice", "Bob", "Carol", "Dan", "Eve", "Frank", "Grace", "Hank", "Ivy", "Jack"]
LAST = ["Adams", "Brown", "Clark", "Davis", "Evans", "Ford", "Gray", "Hill", "Irwin", "Jones"]
DOMAINS = ["gmail.com", "yahoo.com", "hotmail.com", "example.com", "company.com"]


@dataclass(frozen=True)
class FixtureConfig:
    n_customers: int = 200
    n_products: int = 50
    n_orders: int = 2000
    seed: int = 42
    anchor: _dt.date = ANCHOR_DATE


def generate_fixtures(
    spark: SparkSession, cfg: FixtureConfig = FixtureConfig()
) -> dict[str, DataFrame]:
    rng = random.Random(cfg.seed)
    anchor = cfg.anchor

    customers = []
    for cid in range(1, cfg.n_customers + 1):
        name = f"{rng.choice(FIRST)} {rng.choice(LAST)}"
        suffix = "".join(rng.choices("abcdefghijklmnopqrstuvwxyz0123456789", k=4))
        email = f"{name.lower().replace(' ', '')}{suffix}@{rng.choice(DOMAINS)}"
        signup = anchor - _dt.timedelta(days=rng.randint(30, 3 * 365))
        status = "active" if rng.random() < 0.8 else "inactive"
        customers.append((cid, name, email, signup, status))

    products = []
    for pid in range(1, cfg.n_products + 1):
        cat = rng.choice(CATEGORIES)
        lo, hi = PRICE_RANGES[cat]
        price = round(lo + rng.random() * (hi - lo), 2)
        pname = f"{cat} Item {''.join(rng.choices('ABCDEFGHJKMNPQRSTUVWXYZ', k=4))}"
        in_stock = rng.random() < 0.85
        products.append((pid, pname, cat, price, in_stock))

    orders = []
    for oid in range(1, cfg.n_orders + 1):
        cid = rng.randint(1, cfg.n_customers)
        pid = rng.randint(1, cfg.n_products)
        qty = rng.randint(1, 10)
        if rng.random() < 0.4:  # 40% recent (last 90 days)
            days_back = rng.randint(0, 90)
        else:
            days_back = rng.randint(91, 3 * 365)
        odate = _dt.datetime.combine(
            anchor - _dt.timedelta(days=days_back), _dt.time()
        ) + _dt.timedelta(seconds=rng.randint(0, 86399))
        total = round(products[pid - 1][3] * qty, 2)
        orders.append((oid, cid, pid, qty, odate, total))

    return {
        "customers": spark.createDataFrame(customers, schemas.REF_CUSTOMERS),
        "products": spark.createDataFrame(products, schemas.REF_PRODUCTS),
        "orders": spark.createDataFrame(orders, schemas.REF_ORDERS),
    }
