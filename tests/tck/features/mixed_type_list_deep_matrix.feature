Feature: Heterogeneous list deep matrix (tagged-cell semantics end to end)

  Scenario: returning a mixed list round-trips each element's type
    Given an empty graph
    When executing query:
      """
      RETURN [1, 'a', true, 2.5, null] AS l
      """
    Then the result should be, in any order:
      | l                        |
      | [1, 'a', true, 2.5, null] |

  Scenario: filtering mixed elements by same-kind comparison
    Given an empty graph
    When executing query:
      """
      RETURN [x IN [3, 'b', 1, 'a'] WHERE x < 2] AS nums,
             [x IN [3, 'b', 1, 'a'] WHERE x < 'b'] AS strs
      """
    Then the result should be, in any order:
      | nums | strs  |
      | [1]  | ['a'] |

  Scenario: equality picks out exact values across kinds
    Given an empty graph
    When executing query:
      """
      RETURN [x IN [1, '1', true] WHERE x = 1] AS ints,
             [x IN [1, '1', true] WHERE x = '1'] AS strs,
             [x IN [1, '1', true] WHERE x = true] AS bools
      """
    Then the result should be, in any order:
      | ints | strs  | bools  |
      | [1]  | ['1'] | [true] |

  Scenario: arithmetic over mixed elements keeps numeric flavor
    Given an empty graph
    When executing query:
      """
      RETURN [x IN [2, 0.5] | x * 4] AS r
      """
    Then the result should be, in any order:
      | r      |
      | [8, 2] |

  Scenario: string plus over mixed elements concatenates
    Given an empty graph
    When executing query:
      """
      RETURN [x IN ['a', 1] | x + '!'] AS r
      """
    Then the result should be, in any order:
      | r            |
      | ['a!', '1!'] |

  Scenario: membership of each kind in a mixed list
    Given an empty graph
    When executing query:
      """
      WITH [1, 'a', true] AS l
      RETURN 1 IN l AS i, 'a' IN l AS s, true IN l AS b, 2 IN l AS no
      """
    Then the result should be, in any order:
      | i    | s    | b    | no    |
      | true | true | true | false |

  Scenario: UNWIND of a mixed list preserves each element
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 'a', 2.5] AS x
      RETURN x, toString(x) AS s
      """
    Then the result should be, in any order:
      | x   | s     |
      | 1   | '1'   |
      | 'a' | 'a'   |
      | 2.5 | '2.5' |

  Scenario: min and max over unwound mixed numerics keep flavor
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2.5, 2] AS x
      RETURN min(x) AS mn, max(x) AS mx
      """
    Then the result should be, in any order:
      | mn | mx  |
      | 1  | 2.5 |

  Scenario: collect of mixed values rebuilds the heterogeneous list
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 'a'] AS x
      WITH x ORDER BY toString(x)
      RETURN collect(x) AS l
      """
    Then the result should be, in any order:
      | l        |
      | [1, 'a'] |

  Scenario: size and indexing of mixed lists
    Given an empty graph
    When executing query:
      """
      WITH [1, 'a', true] AS l
      RETURN size(l) AS n, l[0] AS first, l[1] AS second, l[-1] AS last
      """
    Then the result should be, in any order:
      | n | first | second | last |
      | 3 | 1     | 'a'    | true |

  Scenario: slices of mixed lists keep element kinds
    Given an empty graph
    When executing query:
      """
      WITH [1, 'a', true, 2.5] AS l
      RETURN l[1..3] AS mid
      """
    Then the result should be, in any order:
      | mid         |
      | ['a', true] |

  Scenario: reverse and tail of mixed lists
    Given an empty graph
    When executing query:
      """
      WITH [1, 'a', true] AS l
      RETURN reverse(l) AS r, tail(l) AS t
      """
    Then the result should be, in any order:
      | r             | t           |
      | [true, 'a', 1] | ['a', true] |

  Scenario: mixed list equality is element and kind exact
    Given an empty graph
    When executing query:
      """
      RETURN [1, 'a'] = [1, 'a'] AS eq, [1, 'a'] = [1.0, 'a'] AS numeq,
             [1, 'a'] = ['1', 'a'] AS kindne
      """
    Then the result should be, in any order:
      | eq   | numeq | kindne |
      | true | true  | false  |

  Scenario: CASE over unwound mixed values dispatches by kind
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 'a', true] AS x
      RETURN CASE WHEN x = 1 THEN 'number' WHEN x = 'a' THEN 'string'
                  WHEN x = true THEN 'boolean' END AS kind
      """
    Then the result should be, in any order:
      | kind      |
      | 'number'  |
      | 'string'  |
      | 'boolean' |

  Scenario: quantifiers over mixed lists use 3VL per element
    Given an empty graph
    When executing query:
      """
      WITH [1, 'a', 3] AS l
      RETURN any(x IN l WHERE x > 2) AS has_big,
             all(x IN l WHERE x > 0) IS NULL AS all_unknown,
             none(x IN l WHERE x > 5) IS NULL AS none_unknown
      """
    Then the result should be, in any order:
      | has_big | all_unknown | none_unknown |
      | true    | true        | true         |

  Scenario: duration values inside mixed lists render ISO
    Given an empty graph
    When executing query:
      """
      RETURN [duration('PT1H'), 'x', 1][0] AS d
      """
    Then the result should be, in any order:
      | d      |
      | 'PT1H' |

  Scenario: temporal values inside mixed lists keep their text form
    Given an empty graph
    When executing query:
      """
      RETURN [date('2024-01-02'), 7][0] AS d, [date('2024-01-02'), 7][1] AS n
      """
    Then the result should be, in any order:
      | d            | n |
      | '2024-01-02' | 7 |

  Scenario: nested mixed lists survive a round trip
    Given an empty graph
    When executing query:
      """
      WITH [[1, 'a'], [true]] AS l
      RETURN l[0] AS first, size(l) AS n
      """
    Then the result should be, in any order:
      | first    | n |
      | [1, 'a'] | 2 |

  Scenario: mixed list concatenation
    Given an empty graph
    When executing query:
      """
      RETURN [1, 'a'] + [true] AS r
      """
    Then the result should be, in any order:
      | r              |
      | [1, 'a', true] |

  Scenario: count distinct over mixed values distinguishes kinds
    Given an empty graph
    When executing query:
      """
      UNWIND [1, '1', 1, true] AS x
      RETURN count(DISTINCT x) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |
