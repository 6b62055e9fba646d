Feature: CASE and null interactions (simple/searched, branches, aggregation)

  Scenario: simple CASE null subject never matches, even a null WHEN
    Given an empty graph
    When executing query:
      """
      RETURN CASE null WHEN null THEN 'matched' ELSE 'else' END AS r
      """
    Then the result should be, in any order:
      | r      |
      | 'else' |

  Scenario: simple CASE with null subject skips value branches
    Given an empty graph
    When executing query:
      """
      RETURN CASE null WHEN 1 THEN 'one' WHEN 2 THEN 'two' ELSE 'else' END AS r
      """
    Then the result should be, in any order:
      | r      |
      | 'else' |

  Scenario: simple CASE with value subject does not match a null WHEN
    Given an empty graph
    When executing query:
      """
      RETURN CASE 1 WHEN null THEN 'null' WHEN 1 THEN 'one' END AS r
      """
    Then the result should be, in any order:
      | r     |
      | 'one' |

  Scenario: simple CASE without ELSE and no match yields null
    Given an empty graph
    When executing query:
      """
      RETURN CASE 5 WHEN 1 THEN 'one' END AS r
      """
    Then the result should be, in any order:
      | r    |
      | null |

  Scenario: searched CASE treats a null condition as not-matched
    Given an empty graph
    When executing query:
      """
      RETURN CASE WHEN null THEN 'null-cond' ELSE 'else' END AS r
      """
    Then the result should be, in any order:
      | r      |
      | 'else' |

  Scenario: searched CASE null comparison condition falls through
    Given an empty graph
    When executing query:
      """
      WITH null AS x
      RETURN CASE WHEN x > 5 THEN 'gt' WHEN x <= 5 THEN 'le' ELSE 'unknown' END AS r
      """
    Then the result should be, in any order:
      | r         |
      | 'unknown' |

  Scenario: searched CASE IS NULL condition fires for null
    Given an empty graph
    When executing query:
      """
      WITH null AS x
      RETURN CASE WHEN x IS NULL THEN 'isnull' ELSE 'notnull' END AS r
      """
    Then the result should be, in any order:
      | r        |
      | 'isnull' |

  Scenario: CASE branch returning null is a legal value
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS i
      RETURN i, CASE i WHEN 1 THEN null ELSE 'v' END AS r
      ORDER BY i
      """
    Then the result should be, in order:
      | i | r    |
      | 1 | null |
      | 2 | 'v'  |

  Scenario: missing property as CASE subject skips all WHENs
    Given an empty graph
    And having executed:
      """
      CREATE (:P {id: 1})
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN CASE p.nothere WHEN null THEN 'null' ELSE 'set' END AS r
      """
    Then the result should be, in any order:
      | r     |
      | 'set' |

  Scenario: CASE over null inside an aggregate counts only decided rows
    Given an empty graph
    When executing query:
      """
      UNWIND [1, null, 3, null] AS x
      RETURN sum(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS nulls,
             sum(CASE WHEN x IS NOT NULL THEN 1 ELSE 0 END) AS vals
      """
    Then the result should be, in any order:
      | nulls | vals |
      | 2     | 2    |

  Scenario: grouping by a CASE result with null bucket
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 5, null, 7, null] AS x
      WITH CASE WHEN x IS NULL THEN 'missing'
                WHEN x < 4 THEN 'low' ELSE 'high' END AS bucket
      RETURN bucket, count(*) AS n ORDER BY bucket
      """
    Then the result should be, in order:
      | bucket    | n |
      | 'high'    | 2 |
      | 'low'     | 1 |
      | 'missing' | 2 |

  Scenario: nested CASE with null inner subject
    Given an empty graph
    When executing query:
      """
      WITH null AS x
      RETURN CASE WHEN true THEN CASE x WHEN null THEN 'inner-null' ELSE 'inner' END
             ELSE 'outer' END AS r
      """
    Then the result should be, in any order:
      | r       |
      | 'inner' |

  Scenario: CASE in WHERE — null result filters the row out
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS i
      WITH i WHERE CASE WHEN i = 2 THEN true WHEN i = 3 THEN null ELSE false END
      RETURN i
      """
    Then the result should be, in any order:
      | i |
      | 2 |

  Scenario: CASE with boolean subject leaves the null row unmatched
    Given an empty graph
    When executing query:
      """
      UNWIND [true, false, null] AS b
      RETURN b, CASE b WHEN true THEN 't' WHEN false THEN 'f' WHEN null THEN 'n' END AS r
      ORDER BY r
      """
    Then the result should be, in order:
      | b     | r    |
      | false | 'f'  |
      | true  | 't'  |
      | null  | null |

  Scenario: CASE subject of mixed type rows matches by value and type
    Given an empty graph
    When executing query:
      """
      UNWIND [1, '1', true] AS x
      RETURN CASE x WHEN 1 THEN 'int' WHEN '1' THEN 'str' WHEN true THEN 'bool' END AS r
      """
    Then the result should be, in any order:
      | r      |
      | 'int'  |
      | 'str'  |
      | 'bool' |

  Scenario: CASE result used in arithmetic propagates null
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS i
      RETURN i, (CASE i WHEN 1 THEN 10 END) + 5 AS r ORDER BY i
      """
    Then the result should be, in order:
      | i | r    |
      | 1 | 15   |
      | 2 | null |

  Scenario: searched CASE first-match-wins with overlapping conditions
    Given an empty graph
    When executing query:
      """
      UNWIND [5, 15, 25] AS x
      RETURN x, CASE WHEN x > 20 THEN 'big' WHEN x > 10 THEN 'mid' WHEN x > 0 THEN 'small' END AS r
      ORDER BY x
      """
    Then the result should be, in order:
      | x  | r       |
      | 5  | 'small' |
      | 15 | 'mid'   |
      | 25 | 'big'   |

  Scenario: CASE over coalesce of nulls
    Given an empty graph
    When executing query:
      """
      RETURN CASE coalesce(null, null, 3) WHEN 3 THEN 'three' END AS r
      """
    Then the result should be, in any order:
      | r       |
      | 'three' |

  Scenario: CASE returning a list vs null list branch
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS i
      RETURN i, CASE WHEN i = 1 THEN [1, 2] ELSE null END AS r ORDER BY i
      """
    Then the result should be, in order:
      | i | r      |
      | 1 | [1, 2] |
      | 2 | null   |

  Scenario: CASE on a relationship property under OPTIONAL MATCH
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})-[:R {w: 2}]->(:B)
      """
    And having executed:
      """
      CREATE (:A {id: 2})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[r:R]->(:B)
      RETURN a.id AS id,
             CASE WHEN r.w > 1 THEN 'heavy' WHEN r IS NULL THEN 'none' ELSE 'light' END AS s
      ORDER BY id
      """
    Then the result should be, in order:
      | id | s       |
      | 1  | 'heavy' |
      | 2  | 'none'  |

  Scenario: simple CASE with an expression subject evaluated once per row
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS i
      RETURN i, CASE i % 2 WHEN 0 THEN 'even' WHEN 1 THEN 'odd' END AS r
      ORDER BY i
      """
    Then the result should be, in order:
      | i | r      |
      | 1 | 'odd'  |
      | 2 | 'even' |
      | 3 | 'odd'  |

  Scenario: CASE inside ORDER BY key with nulls last by value order
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1, 2] AS i
      RETURN i ORDER BY CASE WHEN i = 2 THEN null ELSE i END
      """
    Then the result should be, in order:
      | i |
      | 1 |
      | 3 |
      | 2 |

  Scenario: collect of CASE results skips no rows but keeps nulls out of collect
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS i
      RETURN collect(CASE WHEN i % 2 = 1 THEN i END) AS odds
      """
    Then the result should be, in any order:
      | odds   |
      | [1, 3] |

  Scenario: CASE with string subject and CONTAINS conditions
    Given an empty graph
    When executing query:
      """
      UNWIND ['apple', 'banana', null] AS s
      RETURN CASE WHEN s CONTAINS 'an' THEN 'has-an'
                  WHEN s IS NULL THEN 'null' ELSE 'other' END AS r
      ORDER BY r
      """
    Then the result should be, in order:
      | r        |
      | 'has-an' |
      | 'null'   |
      | 'other'  |

  Scenario: CASE feeding DISTINCT dedups decided and null buckets
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4] AS i
      RETURN DISTINCT CASE WHEN i < 3 THEN 'lo' END AS r
      ORDER BY r
      """
    Then the result should be, in order:
      | r    |
      | 'lo' |
      | null |
