"""MongoDB-semantics conformance pins for the embedded store.

pymongo/Atlas is absent from this image, so the passthrough branch in
store/client.py has never executed here (VERDICT r3 "What's missing" #2).
The available remedy is to pin the embedded store against MongoDB's
*documented* operator semantics, assertion by assertion, so a future run
against real MongoDB has a precise conformance surface to diff.  Every
behavior asserted below is taken from docs.mongodb.com operator pages
(reference usage: db/__init__.py, trainingServer.py:499-508,
peopleCount.py:547-587).
"""

import datetime

import pytest

from facerecognition_infrenceengine_tpu.store import Database
from facerecognition_infrenceengine_tpu.store.documents import WriteError


@pytest.fixture
def db():
    return Database("conformance")


# ------------------------------------------------------- query operators
def test_eq_scalar_and_array_contains(db):
    c = db["q"]
    c.insert_one({"tags": ["a", "b"], "n": 3})
    assert c.find_one({"tags": {"$eq": "a"}}) is not None  # array-contains
    assert c.find_one({"n": {"$eq": 3}}) is not None
    assert c.find_one({"n": {"$eq": 4}}) is None


def test_comparison_ops_do_not_match_across_types(db):
    c = db["q"]
    c.insert_one({"v": "10"})
    c.insert_one({"v": 5})
    # MongoDB's BSON type bracketing: numeric $gt never matches strings.
    assert [d["v"] for d in c.find({"v": {"$gt": 1}})] == [5]
    assert [d["v"] for d in c.find({"v": {"$lt": "z"}})] == ["10"]


def test_ne_null_excludes_missing_and_null(db):
    c = db["q"]
    c.insert_one({"k": 1, "f": None})
    c.insert_one({"k": 2, "f": 7})
    c.insert_one({"k": 3})
    # {$ne: null} matches only docs where the field exists and is non-null.
    assert sorted(d["k"] for d in c.find({"f": {"$ne": None}})) == [2]
    # literal null matches both null and missing (MongoDB null semantics)
    assert sorted(d["k"] for d in c.find({"f": None})) == [1, 3]


def test_all_requires_every_element(db):
    c = db["q"]
    c.insert_one({"k": 1, "tags": ["a", "b", "c"]})
    c.insert_one({"k": 2, "tags": ["a"]})
    assert [d["k"] for d in c.find({"tags": {"$all": ["a", "b"]}})] == [1]
    assert sorted(d["k"] for d in c.find({"tags": {"$all": ["a"]}})) == [1, 2]


def test_size_exact_length_only(db):
    c = db["q"]
    c.insert_one({"k": 1, "tags": ["a", "b"]})
    c.insert_one({"k": 2, "tags": []})
    c.insert_one({"k": 3, "tags": "ab"})  # non-array never matches $size
    assert [d["k"] for d in c.find({"tags": {"$size": 2}})] == [1]
    assert [d["k"] for d in c.find({"tags": {"$size": 0}})] == [2]


def test_elemmatch_docs_and_scalars(db):
    c = db["q"]
    c.insert_one({"k": 1, "r": [{"s": 5}, {"s": 9}]})
    c.insert_one({"k": 2, "r": [{"s": 1}]})
    c.insert_one({"k": 3, "n": [2, 8]})
    # a single element must satisfy ALL conditions at once
    assert [d["k"] for d in
            c.find({"r": {"$elemMatch": {"s": {"$gte": 5, "$lt": 6}}}})] == [1]
    assert [d["k"] for d in
            c.find({"n": {"$elemMatch": {"$gt": 5, "$lt": 9}}})] == [3]


def test_not_negates_operator_condition(db):
    c = db["q"]
    c.insert_one({"k": 1, "p": 10})
    c.insert_one({"k": 2, "p": 2})
    c.insert_one({"k": 3})
    # $not matches docs where the condition fails INCLUDING missing fields
    assert sorted(d["k"] for d in
                  c.find({"p": {"$not": {"$gt": 5}}})) == [2, 3]


def test_nor_and_and_compose(db):
    c = db["q"]
    c.insert_one({"k": 1, "a": 1, "b": 1})
    c.insert_one({"k": 2, "a": 1, "b": 2})
    c.insert_one({"k": 3, "a": 2, "b": 2})
    assert [d["k"] for d in
            c.find({"$nor": [{"a": 1}, {"b": 2}]})] == []
    assert [d["k"] for d in
            c.find({"$nor": [{"a": 2}, {"b": 2}]})] == [1]
    assert [d["k"] for d in
            c.find({"$and": [{"a": 1}, {"b": 2}]})] == [2]


def test_regex_options_case_insensitive(db):
    c = db["q"]
    c.insert_one({"name": "Alice"})
    assert c.find_one({"name": {"$regex": "^ali", "$options": "i"}})
    assert c.find_one({"name": {"$regex": "^ali"}}) is None


# ------------------------------------------------------ update operators
def test_min_max_set_when_missing_and_compare_otherwise(db):
    c = db["u"]
    c.insert_one({"_id": 1, "lo": 5, "hi": 5})
    c.update_one({"_id": 1}, {"$min": {"lo": 7}, "$max": {"hi": 3}})
    d = c.find_one({"_id": 1})
    assert (d["lo"], d["hi"]) == (5, 5)  # no-ops
    c.update_one({"_id": 1}, {"$min": {"lo": 3}, "$max": {"hi": 7}})
    d = c.find_one({"_id": 1})
    assert (d["lo"], d["hi"]) == (3, 7)
    c.update_one({"_id": 1}, {"$min": {"fresh": 9}})
    assert c.find_one({"_id": 1})["fresh"] == 9  # missing field: set


def test_currentdate_sets_utc_datetime(db):
    c = db["u"]
    c.insert_one({"_id": 1})
    c.update_one({"_id": 1}, {"$currentDate": {"ts": True}})
    ts = c.find_one({"_id": 1})["ts"]
    assert isinstance(ts, datetime.datetime) and ts.tzinfo is not None


def test_push_each_position_sort_slice_order(db):
    c = db["u"]
    c.insert_one({"_id": 1, "q": [{"s": 5}, {"s": 1}]})
    # MongoDB applies $position, then $sort, then $slice
    c.update_one({"_id": 1}, {"$push": {"q": {
        "$each": [{"s": 4}, {"s": 2}], "$sort": {"s": -1}, "$slice": 3}}})
    assert [e["s"] for e in c.find_one({"_id": 1})["q"]] == [5, 4, 2]
    # negative slice keeps the LAST n
    c.update_one({"_id": 1}, {"$push": {"q": {"$each": [], "$slice": -2}}})
    assert [e["s"] for e in c.find_one({"_id": 1})["q"]] == [4, 2]
    # $position inserts at the index; scalar $sort orders whole elements
    c.insert_one({"_id": 2, "v": [3, 1]})
    c.update_one({"_id": 2}, {"$push": {"v": {"$each": [9], "$position": 0}}})
    assert c.find_one({"_id": 2})["v"] == [9, 3, 1]
    c.update_one({"_id": 2}, {"$push": {"v": {"$each": [], "$sort": 1}}})
    assert c.find_one({"_id": 2})["v"] == [1, 3, 9]
    # slice 0 empties the array
    c.update_one({"_id": 2}, {"$push": {"v": {"$each": [7], "$slice": 0}}})
    assert c.find_one({"_id": 2})["v"] == []


def test_push_unknown_clause_rejected(db):
    c = db["u"]
    c.insert_one({"_id": 1, "v": []})
    with pytest.raises(WriteError):
        c.update_one({"_id": 1},
                     {"$push": {"v": {"$each": [1], "$bogus": 1}}})


def test_set_through_scalar_intermediate_raises(db):
    c = db["u"]
    c.insert_one({"_id": 1, "a": 5})
    with pytest.raises(WriteError):
        c.update_one({"_id": 1}, {"$set": {"a.b": 1}})
    assert c.find_one({"_id": 1})["a"] == 5  # untouched


def test_setoninsert_only_on_upsert_insert(db):
    c = db["u"]
    c.update_one({"k": "x"}, {"$set": {"v": 1}, "$setOnInsert": {"init": 1}},
                 upsert=True)
    d = c.find_one({"k": "x"})
    assert d["init"] == 1 and d["v"] == 1
    c.update_one({"k": "x"}, {"$set": {"v": 2}, "$setOnInsert": {"init": 9}},
                 upsert=True)
    d = c.find_one({"k": "x"})
    assert d["init"] == 1 and d["v"] == 2  # existing doc: $setOnInsert inert


# ---------------------------------------------------------- aggregation
@pytest.fixture
def sales(db):
    c = db["sales"]
    c.insert_many([
        {"item": "a", "price": 10, "qty": 2, "tags": ["x", "y"]},
        {"item": "a", "price": 20, "qty": 1, "tags": ["x"]},
        {"item": "b", "price": 5, "qty": 10, "tags": []},
        {"item": "c", "price": 5, "qty": 10},
    ])
    return c


def test_group_accumulators(sales):
    rows = {r["_id"]: r for r in sales.aggregate([
        {"$group": {"_id": "$item", "n": {"$sum": 1},
                    "avg": {"$avg": "$price"}, "lo": {"$min": "$price"},
                    "hi": {"$max": "$price"}, "first": {"$first": "$price"},
                    "last": {"$last": "$price"},
                    "prices": {"$push": "$price"}}}])}
    a = rows["a"]
    assert (a["n"], a["avg"], a["lo"], a["hi"]) == (2, 15, 10, 20)
    assert (a["first"], a["last"], a["prices"]) == (10, 20, [10, 20])


def test_group_key_types_do_not_merge(db):
    c = db["g"]
    c.insert_many([{"k": 1}, {"k": "1"}])
    rows = c.aggregate([{"$group": {"_id": "$k", "n": {"$sum": 1}}}])
    assert len(rows) == 2  # int 1 and str "1" are distinct groups


def test_unwind_semantics(sales):
    rows = sales.aggregate([{"$unwind": "$tags"}])
    # arrays fan out per element; [] and missing drop the doc entirely
    assert sorted((r["item"], r["tags"]) for r in rows) == [
        ("a", "x"), ("a", "x"), ("a", "y")]


def test_match_project_skip_limit_count(sales):
    rows = sales.aggregate([
        {"$match": {"price": {"$gte": 5}}},
        {"$sort": {"price": -1, "item": 1}},
        {"$skip": 1},
        {"$limit": 2},
        {"$project": {"item": 1, "_id": 0}},
    ])
    assert rows == [{"item": "a"}, {"item": "b"}]
    assert sales.aggregate([{"$match": {"item": "a"}},
                            {"$count": "total"}]) == [{"total": 2}]


def test_projection_exclusive_and_inclusive(db):
    c = db["p"]
    c.insert_one({"_id": 1, "a": 1, "b": {"c": 2, "d": 3}})
    assert c.find_one({"_id": 1}, {"b.c": 1}) == {"_id": 1, "b": {"c": 2}}
    assert c.find_one({"_id": 1}, {"b": 0, "_id": 0}) == {"a": 1}


def test_sort_missing_fields_first_ascending(db):
    c = db["s"]
    c.insert_many([{"k": 2, "v": 5}, {"k": 1}, {"k": 3, "v": 1}])
    got = [d["k"] for d in c.find({}).sort("v", 1)]
    assert got == [1, 3, 2]  # missing sorts as null, lowest


# ----------------------------------------- field/array update operators
def test_mul_multiplies_and_creates_zero(db):
    c = db["u"]
    c.insert_one({"_id": 1, "n": 6})
    c.update_one({"_id": 1}, {"$mul": {"n": 2.5, "absent": 3}})
    doc = c.find_one({"_id": 1})
    assert doc["n"] == 15.0
    # missing field is created as zero (docs.mongodb.com $mul)
    assert doc["absent"] == 0
    c.insert_one({"_id": 2, "s": "x"})
    with pytest.raises(WriteError):
        c.update_one({"_id": 2}, {"$mul": {"s": 2}})


def test_rename_moves_value_and_noops_on_missing(db):
    c = db["u"]
    c.insert_one({"_id": 1, "nmae": 7, "keep": 1})
    c.update_one({"_id": 1}, {"$rename": {"nmae": "name", "ghost": "g2"}})
    assert c.find_one({"_id": 1}) == {"_id": 1, "name": 7, "keep": 1}
    # dotted paths: rename performs an $unset + $set pair
    c.insert_one({"_id": 2, "a": {"b": 3}})
    c.update_one({"_id": 2}, {"$rename": {"a.b": "c.d"}})
    assert c.find_one({"_id": 2}) == {"_id": 2, "a": {}, "c": {"d": 3}}
    with pytest.raises(WriteError):
        c.update_one({"_id": 1}, {"$rename": {"name": "name"}})


def test_pop_first_and_last(db):
    c = db["u"]
    c.insert_one({"_id": 1, "a": [1, 2, 3]})
    c.update_one({"_id": 1}, {"$pop": {"a": 1}})
    assert c.find_one({"_id": 1})["a"] == [1, 2]
    c.update_one({"_id": 1}, {"$pop": {"a": -1}})
    assert c.find_one({"_id": 1})["a"] == [2]
    c.update_one({"_id": 1}, {"$pop": {"missing": 1}})  # no-op, no error
    with pytest.raises(WriteError):
        c.update_one({"_id": 1}, {"$pop": {"a": 2}})
    c.insert_one({"_id": 2, "a": "scalar"})
    with pytest.raises(WriteError):
        c.update_one({"_id": 2}, {"$pop": {"a": 1}})


def test_pullall_exact_values_only(db):
    c = db["u"]
    c.insert_one({"_id": 1, "a": [0, 2, 5, 5, 1, 0], "d": [{"x": 1}, {"x": 2}]})
    c.update_one({"_id": 1}, {"$pullAll": {"a": [0, 5]}})
    assert c.find_one({"_id": 1})["a"] == [2, 1]
    # whole-value equality for documents — NOT query-condition matching
    c.update_one({"_id": 1}, {"$pullAll": {"d": [{"x": 1}]}})
    assert c.find_one({"_id": 1})["d"] == [{"x": 2}]
    with pytest.raises(WriteError):
        c.update_one({"_id": 1}, {"$pullAll": {"a": 3}})  # not an array
    c.insert_one({"_id": 2, "a": "scalar"})
    with pytest.raises(WriteError):
        c.update_one({"_id": 2}, {"$pullAll": {"a": [1]}})


# ------------------------------------------------- aggregation stages
def test_lookup_equality_join(db):
    orders = db["orders"]
    items = db["items"]
    items.insert_many([
        {"_id": 1, "sku": "a", "desc": "apple"},
        {"_id": 2, "sku": "b", "desc": "bread"},
        {"_id": 3, "sku": None, "desc": "blank"},
    ])
    orders.insert_many([
        {"_id": 10, "item": "a"},
        {"_id": 11, "item": "z"},
        {"_id": 12},  # missing localField joins as null
    ])
    rows = orders.aggregate([
        {"$lookup": {"from": "items", "localField": "item",
                     "foreignField": "sku", "as": "det"}},
        {"$sort": {"_id": 1}},
    ])
    assert [[f["_id"] for f in r["det"]] for r in rows] == [[1], [], [3]]


def test_lookup_array_contains_both_sides(db):
    a = db["la"]
    b = db["lb"]
    b.insert_many([{"_id": 1, "tags": ["x", "y"]}, {"_id": 2, "tags": ["z"]}])
    a.insert_one({"_id": 10, "want": ["y", "q"]})
    rows = a.aggregate([
        {"$lookup": {"from": "lb", "localField": "want",
                     "foreignField": "tags", "as": "hit"}}])
    assert [f["_id"] for f in rows[0]["hit"]] == [1]


def test_addfields_set_alias_and_replaceroot(db):
    c = db["ag"]
    c.insert_one({"_id": 1, "a": 2, "sub": {"x": 7}})
    rows = c.aggregate([
        {"$addFields": {"b": "$a", "lit": 5}},
        {"$set": {"c.d": "$sub.x"}},  # $set alias, dotted target path
    ])
    assert rows == [{"_id": 1, "a": 2, "sub": {"x": 7}, "b": 2, "lit": 5,
                     "c": {"d": 7}}]
    rows = c.aggregate([{"$replaceRoot": {"newRoot": "$sub"}}])
    assert rows == [{"x": 7}]
    with pytest.raises(ValueError):
        c.aggregate([{"$replaceRoot": {"newRoot": "$a"}}])


# --------------------------------------------- aggregation expressions
def test_arithmetic_expressions_null_propagation(db):
    c = db["ex"]
    c.insert_one({"_id": 1, "a": 6, "b": 4})
    rows = c.aggregate([{"$addFields": {
        "sum": {"$add": ["$a", "$b", 1]},
        "prod": {"$multiply": ["$a", "$b"]},
        "diff": {"$subtract": ["$a", "$b"]},
        "quot": {"$divide": ["$a", "$b"]},
        "rem": {"$mod": ["$a", "$b"]},
        "nul": {"$add": ["$a", "$missing"]},  # null/missing -> null
    }}])
    r = rows[0]
    assert (r["sum"], r["prod"], r["diff"], r["quot"], r["rem"], r["nul"]) \
        == (11, 24, 2, 1.5, 2, None)
    with pytest.raises(ValueError):
        c.aggregate([{"$addFields": {"x": {"$divide": ["$a", 0]}}}])


def test_cond_ifnull_and_boolean_truthiness(db):
    c = db["ex"]
    c.insert_one({"_id": 1, "n": 0, "s": "", "arr": []})
    rows = c.aggregate([{"$addFields": {
        "z": {"$cond": [{"$gt": ["$n", 5]}, "big", "small"]},
        "obj": {"$cond": {"if": "$s", "then": "truthy", "else": "falsy"}},
        "fb": {"$ifNull": ["$missing", "$n"]},
        "andv": {"$and": ["$arr", "$s"]},   # '' and [] are TRUTHY
        "orv": {"$or": ["$n", False]},      # 0 is falsy
        "notv": {"$not": ["$n"]},
    }}])
    r = rows[0]
    assert (r["z"], r["obj"], r["fb"], r["andv"], r["orv"], r["notv"]) == \
        ("small", "truthy", 0, True, False, True)


def test_string_array_and_comparison_expressions(db):
    c = db["ex"]
    c.insert_one({"_id": 1, "s": "Ab", "t": "cd", "arr": [10, 20, 30]})
    rows = c.aggregate([{"$addFields": {
        "cat": {"$concat": ["$s", "-", "$t"]},
        "up": {"$toUpper": "$s"},
        "low": {"$toLower": "$s"},
        "n": {"$size": "$arr"},
        "at": {"$arrayElemAt": ["$arr", -1]},
        "oob": {"$arrayElemAt": ["$arr", 9]},
        "has": {"$in": [20, "$arr"]},
        "cmp": {"$cmp": ["$s", "$t"]},
        "eq": {"$eq": ["$s", "Ab"]},
        "root": {"$literal": "$s"},  # $literal does NOT resolve
    }}])
    r = rows[0]
    assert (r["cat"], r["up"], r["low"], r["n"], r["at"], r["oob"],
            r["has"], r["cmp"], r["eq"], r["root"]) == \
        ("Ab-cd", "AB", "ab", 3, 30, None, True, -1, True, "$s")


def test_group_accumulator_takes_computed_expression(db):
    c = db["ex2"]
    c.insert_many([{"k": "a", "q": 2, "p": 5}, {"k": "a", "q": 3, "p": 4},
                   {"k": "b", "q": 1, "p": 7}])
    rows = c.aggregate([
        {"$group": {"_id": "$k",
                    "rev": {"$sum": {"$multiply": ["$q", "$p"]}}}},
        {"$sort": {"_id": 1}}])
    assert rows == [{"_id": "a", "rev": 22}, {"_id": "b", "rev": 7}]


def test_root_variable_in_replaceroot(db):
    c = db["ex3"]
    c.insert_one({"_id": 1, "a": 2})
    rows = c.aggregate([{"$replaceRoot": {
        "newRoot": {"wrapped": "$$ROOT", "b": 3}}}])
    assert rows == [{"wrapped": {"_id": 1, "a": 2}, "b": 3}]


def test_expr_query_compares_two_fields(db):
    c = db["exq"]
    c.insert_many([{"k": 1, "spent": 5, "budget": 9},
                   {"k": 2, "spent": 12, "budget": 9}])
    # $expr lets a find() compare document fields to each other
    over = [d["k"] for d in c.find({"$expr": {"$gt": ["$spent", "$budget"]}})]
    assert over == [2]
    # and compose with ordinary query operators
    got = [d["k"] for d in c.find({"k": {"$gte": 1},
                                   "$expr": {"$lte": ["$spent", "$budget"]}})]
    assert got == [1]


def test_find_one_and_delete_returns_doc(db):
    c = db["fad"]
    c.insert_many([{"_id": 1, "p": 2}, {"_id": 2, "p": 1}])
    got = c.find_one_and_delete({"p": {"$gte": 1}}, sort=[("p", 1)])
    assert got["_id"] == 2
    assert c.count_documents({}) == 1
    assert c.find_one_and_delete({"p": 99}) is None


def test_find_one_and_replace_rejects_operators(db):
    c = db["far"]
    c.insert_one({"_id": 1, "a": 1})
    before = c.find_one_and_replace({"_id": 1}, {"b": 2})
    assert before == {"_id": 1, "a": 1}
    assert c.find_one({"_id": 1}) == {"_id": 1, "b": 2}
    with pytest.raises(ValueError):
        c.find_one_and_replace({"_id": 1}, {"$set": {"x": 1}})


def test_type_query_operator(db):
    c = db["ty"]
    c.insert_many([
        {"k": 1, "v": 3}, {"k": 2, "v": 3.5}, {"k": 3, "v": "s"},
        {"k": 4, "v": [1, "x"]}, {"k": 5, "v": None}, {"k": 6, "v": True},
        {"k": 7},
    ])
    assert sorted(d["k"] for d in c.find({"v": {"$type": "number"}})) \
        == [1, 2, 4]  # array matches per element
    assert sorted(d["k"] for d in c.find({"v": {"$type": "string"}})) \
        == [3, 4]
    assert [d["k"] for d in c.find({"v": {"$type": "array"}})] == [4]
    assert [d["k"] for d in c.find({"v": {"$type": "null"}})] == [5]
    assert [d["k"] for d in c.find({"v": {"$type": "bool"}})] == [6]
    # numeric BSON codes and lists of types
    assert [d["k"] for d in c.find({"v": {"$type": 2}})] in ([3, 4], [3, 4])
    assert sorted(d["k"] for d in c.find({"v": {"$type": ["bool", "null"]}})) \
        == [5, 6]
    # missing field never matches
    assert not [d for d in c.find({"v": {"$type": "missing"}})]
    # deprecated-but-valid numeric codes (symbol=14, dbPointer=12,
    # javascriptWithScope=15) are legal queries that simply match nothing
    # here — MongoDB accepts them; only genuinely invalid codes error
    for code in (12, 14, 15):
        assert not list(c.find({"v": {"$type": code}}))
    with pytest.raises(Exception):
        list(c.find({"v": {"$type": 99}}))


def test_inc_rejects_non_numeric_and_null(db):
    c = db["inc"]
    c.insert_one({"_id": 1, "s": "x", "n": None, "ok": 1})
    with pytest.raises(WriteError):
        c.update_one({"_id": 1}, {"$inc": {"s": 1}})
    with pytest.raises(WriteError):
        c.update_one({"_id": 1}, {"$inc": {"n": 1}})
    c.update_one({"_id": 1}, {"$inc": {"ok": 2, "fresh": 5}})
    doc = c.find_one({"_id": 1})
    assert doc["ok"] == 3 and doc["fresh"] == 5


def test_mul_and_inc_reject_non_numeric_operands(db):
    """docs.mongodb.com $mul/$inc: 'Cannot multiply/increment with
    non-numeric argument' — the OPERAND must be numeric, not just the
    current value (advisor r4: str*int would silently repeat the string)."""
    c = db["ops"]
    c.insert_one({"_id": 1, "n": 6})
    with pytest.raises(WriteError):
        c.update_one({"_id": 1}, {"$mul": {"n": "x"}})
    with pytest.raises(WriteError):
        c.update_one({"_id": 1}, {"$mul": {"absent": "x"}})
    with pytest.raises(WriteError):
        c.update_one({"_id": 1}, {"$inc": {"n": "z"}})
    with pytest.raises(WriteError):
        c.update_one({"_id": 1}, {"$inc": {"fresh": "z"}})
    with pytest.raises(WriteError):  # bool is not numeric in BSON
        c.update_one({"_id": 1}, {"$mul": {"n": True}})
    assert c.find_one({"_id": 1}) == {"_id": 1, "n": 6}  # untouched
    # bulk_write captures these as per-op write errors, not raw TypeError
    from facerecognition_infrenceengine_tpu.store.documents import UpdateOne
    with pytest.raises(Exception) as ei:
        c.bulk_write([UpdateOne({"_id": 1}, {"$inc": {"n": "z"}})])
    assert not isinstance(ei.value, TypeError)


def test_aggregation_mod_keeps_dividend_sign(db):
    """$mod is C-style (dividend's sign), unlike Python's % (divisor's)."""
    c = db["modsign"]
    c.insert_many([
        {"k": 1, "a": -5, "b": 3}, {"k": 2, "a": 5, "b": -3},
        {"k": 3, "a": 7, "b": 2}, {"k": 4, "a": -7.5, "b": 2},
    ])
    got = {d["k"]: d["r"] for d in c.aggregate([
        {"$addFields": {"r": {"$mod": ["$a", "$b"]}}}])}
    assert got[1] == -2      # Python % would say 1
    assert got[2] == 2       # Python % would say -1
    assert got[3] == 1
    assert got[4] == -1.5
    assert isinstance(got[3], int)  # int operands stay int


def test_type_numeric_codes_binData_and_invalid(db):
    c = db["tycodes"]
    c.insert_many([{"k": 1, "v": b"\x00\x01"}, {"k": 2, "v": "s"}])
    # code 5 = binData must be resolvable (advisor r4: it never matched)
    assert [d["k"] for d in c.find({"v": {"$type": 5}})] == [1]
    assert [d["k"] for d in c.find({"v": {"$type": "binData"}})] == [1]
    # invalid numeric codes error like MongoDB, not silently no-match
    with pytest.raises(Exception):
        list(c.find({"v": {"$type": 99}}))


# --------------------------------------------- round-5 deep-review pins
def test_upsert_on_existing_pinned_id_raises_duplicate(db):
    """update_one({'_id': X, 'version': N}, ..., upsert=True) where X
    exists with a different version must raise E11000 (the optimistic-
    concurrency pattern), NOT silently replace X with a skeleton doc."""
    from facerecognition_infrenceengine_tpu.store.documents import (
        DuplicateKeyError)

    c = db["occ"]
    c.insert_one({"_id": "X", "version": 2, "payload": "keep me"})
    with pytest.raises(DuplicateKeyError):
        c.update_one({"_id": "X", "version": 3},
                     {"$set": {"payload": "clobber"}}, upsert=True)
    doc = c.find_one({"_id": "X"})
    assert doc["version"] == 2 and doc["payload"] == "keep me"


def test_replacement_upsert_without_id_gets_real_objectid(db):
    """replace_one(filter-without-_id, doc, upsert=True) must mint a real
    ObjectId — not store the doc under _id=None, where a second such
    upsert would silently overwrite the first."""
    from facerecognition_infrenceengine_tpu.store.documents import ObjectId

    c = db["repup"]
    r1 = c.replace_one({"employeeId": "E1"},
                       {"employeeId": "E1", "name": "A"}, upsert=True)
    r2 = c.replace_one({"employeeId": "E2"},
                       {"employeeId": "E2", "name": "B"}, upsert=True)
    assert isinstance(r1.upserted_id, ObjectId)
    assert isinstance(r2.upserted_id, ObjectId)
    assert r1.upserted_id != r2.upserted_id
    assert c.count_documents({}) == 2
    got = c.find_one_and_replace({"employeeId": "E3"},
                                 {"employeeId": "E3"}, upsert=True,
                                 return_document=True)
    assert got is not None and got["employeeId"] == "E3"
    assert isinstance(got["_id"], ObjectId)


def test_set_cannot_retype_id_to_string(db):
    """_id is immutable INCLUDING its type: $set-ing the hex string of an
    ObjectId _id must raise, not silently retype (which would orphan the
    doc from ObjectId-equality lookups)."""
    from facerecognition_infrenceengine_tpu.store.documents import ObjectId

    c = db["idty"]
    oid = ObjectId()
    c.insert_one({"_id": oid, "v": 1})
    with pytest.raises(Exception):
        c.update_one({"_id": oid}, {"$set": {"_id": str(oid)}})
    assert c.find_one({"_id": oid})["v"] == 1


def test_project_field_rename_and_expression(db):
    """$project values that are '$field' refs or operator expressions are
    computed (MongoDB), not treated as truthy include flags."""
    c = db["proj"]
    c.insert_many([
        {"k": 1, "hostEmployeeId": "H9", "a": 2, "b": 3},
        {"k": 2, "a": 5, "b": 7},  # no hostEmployeeId -> field dropped
    ])
    rows = {d["k"]: d for d in c.aggregate([
        {"$project": {"k": 1, "host": "$hostEmployeeId",
                      "s": {"$add": ["$a", "$b"]}, "_id": 0}}])}
    assert rows[1] == {"k": 1, "host": "H9", "s": 5}
    assert rows[2] == {"k": 2, "s": 12}  # missing ref drops the field
    # pure-flag projections keep the fast find()-path behavior
    only = list(c.aggregate([{"$match": {"k": 1}},
                             {"$project": {"a": 1, "_id": 0}}]))
    assert only == [{"a": 2}]


def test_group_sum_and_avg_ignore_booleans(db):
    """{'$sum': True} is a non-numeric literal (MongoDB returns 0) and
    $avg skips boolean values rather than counting True as 1."""
    c = db["boolagg"]
    c.insert_many([{"v": True}, {"v": True}, {"v": 2}])
    row, = c.aggregate([{"$group": {"_id": None, "n": {"$sum": True},
                                    "a": {"$avg": "$v"},
                                    "s": {"$sum": "$v"}}}])
    assert row["n"] == 0
    assert row["a"] == 2.0  # only the numeric 2 participates
    assert row["s"] == 2


def test_in_nin_all_match_whole_array_values(db):
    """$in/$nin/$all compare the whole array value too (MongoDB's
    array-equality branch), not only per element."""
    c = db["arrin"]
    c.insert_one({"k": 1, "tags": ["a", "b"]})
    assert c.find_one({"tags": {"$in": [["a", "b"]]}}) is not None
    assert c.find_one({"tags": {"$nin": [["a", "b"]]}}) is None
    assert c.find_one({"tags": {"$all": [["a", "b"]]}}) is not None
    assert c.find_one({"tags": {"$in": [["a", "z"]]}}) is None


def test_unique_index_enforces_duplicate_nulls(db):
    """Non-sparse unique indexes treat missing fields as null: the second
    doc omitting every indexed field must raise E11000 like MongoDB, not
    silently accumulate."""
    from facerecognition_infrenceengine_tpu.store.documents import (
        DuplicateKeyError)

    c = db["uniqnull"]
    c.create_index([("person_id", 1), ("campus_id", 1)], unique=True)
    c.insert_one({"note": "first, no keys"})
    with pytest.raises(DuplicateKeyError):
        c.insert_one({"note": "second, no keys"})
    # distinct non-null values still fine
    c.insert_one({"person_id": "p1", "campus_id": "c1"})
    c.insert_one({"person_id": "p2", "campus_id": "c1"})


def test_concurrent_flush_does_not_corrupt_snapshot(tmp_path):
    """flush() from multiple threads (periodic flusher vs close/atexit)
    must never interleave writes into one tmp file; the snapshot stays
    loadable."""
    import threading as _t

    from facerecognition_infrenceengine_tpu.store.documents import Database

    d = Database("flushrace", persist_dir=str(tmp_path))
    c = d["c"]

    def hammer(i):
        for j in range(20):
            c.insert_one({"i": i, "j": j})
            d.flush()

    threads = [_t.Thread(target=hammer, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    d.close()
    d2 = Database("flushrace", persist_dir=str(tmp_path))
    assert d2["c"].count_documents({}) == 120
    d2.close()


def test_fre_uri_without_port_defaults(monkeypatch):
    """MONGODB_URI=fre://localhost must default to port 27027, not crash
    int('localhost')."""
    from facerecognition_infrenceengine_tpu.store import client as cl

    captured = {}

    class _Fake:
        def __init__(self, host, port, name=""):
            captured["hostport"] = (host, port)

    from facerecognition_infrenceengine_tpu.store import remote
    monkeypatch.setattr(remote, "RemoteDatabase", _Fake)
    from facerecognition_infrenceengine_tpu.core.config import Config

    cfg = Config()
    cfg.db.mongodb_uri = "fre://localhost"
    cl._make_backend(cfg)
    assert captured["hostport"] == ("localhost", 27027)
