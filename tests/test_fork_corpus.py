"""The fork's own test corpus, through the SQL front door.

The reference fork ships two manual SQL scripts that motivated its
operators (sql_files/sml.sql — equi-joins + group-by-count, the
GROUP_JOIN shape; sql_files/big.sql — `!=` theta joins + multi-join
aggregates, the AM_US_JOIN shape) plus the amusjoin sqllogictests
(test/sql/amusjoin/). This runs the same query shapes on the same tiny
data through ``myduckdb_spark.sql.sql`` and checks row-for-row against
DuckDB executing the identical statements — sqllogictest-style parity
on the fork's own corpus.
"""

import duckdb
import pytest

from myduckdb_spark.sql import sql

STUD = [(101, "A", 25), (102, "B", 26), (103, "A", 27), (104, "B", 23),
        (105, "A", 30), (107, "D", 30), (108, "C", 25)]
ENROL = [(101, 1), (101, 2), (102, 3), (103, 4), (102, 2), (105, 1), (108, 1)]

USERS = [(1, "Ann", "Ames", "1 St", "a@x"), (2, "Bob", "Best", "2 St", "b@x"),
         (3, "Cyd", "Carr", "3 St", "c@x")]
PRODUCTS = [(10, "widget", "w", 5), (20, "gadget", "g", 9), (30, "sprocket", "s", 3)]
ORDERS = [(100, 1, 10, 5), (101, 1, 20, 9), (102, 2, 10, 5), (103, 3, 30, 3),
          (104, 2, 20, 18)]

QUERIES = {
    # sml.sql Query 01-03 (GROUP_JOIN motivating shapes)
    "sml_q1": "SELECT stud.sid, enrol.cid FROM stud JOIN enrol ON stud.sid = enrol.sid",
    "sml_q2": "SELECT stud.sid, enrol.cid FROM stud JOIN enrol ON stud.sid = enrol.sid "
              "WHERE stud.sage > 25",
    "sml_q3": "SELECT enrol.cid, COUNT(stud.sid) AS student_count FROM stud "
              "JOIN enrol ON stud.sid = enrol.sid GROUP BY enrol.cid",
    # big.sql Query A-D (AM_US theta-join motivating shapes)
    "big_qa": "SELECT users.user_id, orders.order_id FROM users "
              "JOIN orders ON users.user_id != orders.user_id",
    "big_qb": "SELECT u.first_name, u.last_name, p.product_name, o.total_paid "
              "FROM orders o JOIN users u ON o.user_id != u.user_id "
              "JOIN products p ON o.product_ordered != p.product_id",
    "big_qc": "SELECT o.user_id, o.product_ordered, SUM(o.total_paid) AS total_spent "
              "FROM orders o GROUP BY o.user_id, o.product_ordered",
    "big_qd": "SELECT u.first_name, u.last_name, p.product_name, "
              "SUM(o.total_paid) AS total_spent FROM orders o "
              "JOIN users u ON o.user_id != u.user_id "
              "JOIN products p ON o.product_ordered != p.product_id "
              "GROUP BY u.user_id, p.product_id, u.first_name, u.last_name, p.product_name",
}


@pytest.fixture(scope="module")
def engines(spark):
    spark.createDataFrame(STUD, "sid int, sname string, sage int").createOrReplaceTempView("stud")
    spark.createDataFrame(ENROL, "sid int, cid int").createOrReplaceTempView("enrol")
    spark.createDataFrame(
        USERS, "user_id int, first_name string, last_name string, address string, email string"
    ).createOrReplaceTempView("users")
    spark.createDataFrame(
        PRODUCTS, "product_id int, product_name string, description string, price int"
    ).createOrReplaceTempView("products")
    spark.createDataFrame(
        ORDERS, "order_id int, user_id int, product_ordered int, total_paid int"
    ).createOrReplaceTempView("orders")

    con = duckdb.connect()
    con.sql("CREATE TABLE stud (sid INT, sname VARCHAR, sage INT)")
    con.sql("CREATE TABLE enrol (sid INT, cid INT)")
    con.executemany("INSERT INTO stud VALUES (?, ?, ?)", STUD)
    con.executemany("INSERT INTO enrol VALUES (?, ?)", ENROL)
    con.sql("CREATE TABLE users (user_id INT, first_name VARCHAR, last_name VARCHAR,"
            " address VARCHAR, email VARCHAR)")
    con.sql("CREATE TABLE products (product_id INT, product_name VARCHAR,"
            " description VARCHAR, price INT)")
    con.sql("CREATE TABLE orders (order_id INT, user_id INT, product_ordered INT,"
            " total_paid INT)")
    con.executemany("INSERT INTO users VALUES (?, ?, ?, ?, ?)", USERS)
    con.executemany("INSERT INTO products VALUES (?, ?, ?, ?)", PRODUCTS)
    con.executemany("INSERT INTO orders VALUES (?, ?, ?, ?)", ORDERS)
    return spark, con


@pytest.mark.parametrize("name", list(QUERIES))
def test_fork_corpus_query(engines, name):
    spark, con = engines
    text = QUERIES[name]
    got = sorted(tuple(r) for r in sql(spark, text).collect())
    want = sorted(tuple(r) for r in con.sql(text).fetchall())
    assert got == want, (name, got[:5], want[:5])
