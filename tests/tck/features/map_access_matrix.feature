Feature: Map literal access matrix — dot, bracket, keys, nulls

  Scenario: nested dot access
    Given an empty graph
    When executing query:
      """
      RETURN {a: 1, b: {c: 2}}.b.c AS v
      """
    Then the result should be, in any order:
      | v |
      | 2 |

  Scenario: bracket access with a literal key
    Given an empty graph
    When executing query:
      """
      RETURN {a: 1}['a'] AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: bracket access with a computed key
    Given an empty graph
    When executing query:
      """
      WITH {one: 1, two: 2} AS m, 'tw' AS p
      RETURN m[p + 'o'] AS v
      """
    Then the result should be, in any order:
      | v |
      | 2 |

  Scenario: missing key is null for dot and bracket
    Given an empty graph
    When executing query:
      """
      WITH {a: 1} AS m RETURN m.missing AS d, m['missing'] AS b
      """
    Then the result should be, in any order:
      | d    | b    |
      | null | null |

  Scenario: null key is null
    Given an empty graph
    When executing query:
      """
      WITH {a: 1} AS m RETURN m[null] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: keys of a map are its property names
    Given an empty graph
    When executing query:
      """
      WITH {b: 2, a: 1} AS m
      UNWIND keys(m) AS k
      RETURN k ORDER BY k
      """
    Then the result should be, in order:
      | k   |
      | 'a' |
      | 'b' |

  Scenario: map equality is key-value equality
    Given an empty graph
    When executing query:
      """
      RETURN {a: 1, b: 2} = {b: 2, a: 1} AS eq, {a: 1} = {a: 2} AS ne
      """
    Then the result should be, in any order:
      | eq   | ne    |
      | true | false |

  Scenario: maps with different key sets are not equal
    Given an empty graph
    When executing query:
      """
      RETURN {a: 1} = {a: 1, b: 2} AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |

  Scenario: map equality with null values is unknown
    Given an empty graph
    When executing query:
      """
      RETURN {a: null} = {a: null} AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: map inside a list round-trips
    Given an empty graph
    When executing query:
      """
      WITH [{k: 1}, {k: 2}] AS ms
      UNWIND ms AS m
      RETURN m.k AS k ORDER BY k
      """
    Then the result should be, in order:
      | k |
      | 1 |
      | 2 |

  Scenario: map parameter access
    Given an empty graph
    And parameters are:
      | conf | {size: 10, name: 'x'} |
    When executing query:
      """
      RETURN $conf.size AS s, $conf.name AS n
      """
    Then the result should be, in any order:
      | s  | n   |
      | 10 | 'x' |

  Scenario: returning a whole map literal
    Given an empty graph
    When executing query:
      """
      RETURN {a: 1, s: 'x'} AS m
      """
    Then the result should be, in any order:
      | m             |
      | {a: 1, s: 'x'} |

  Scenario: size of keys counts entries
    Given an empty graph
    When executing query:
      """
      RETURN size(keys({a: 1, b: 2, c: 3})) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |

  Scenario: CASE over map values
    Given an empty graph
    When executing query:
      """
      WITH {mode: 'fast'} AS m
      RETURN CASE m.mode WHEN 'fast' THEN 1 ELSE 0 END AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: node properties function returns the full map
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1, b: 'x'})
      """
    When executing query:
      """
      MATCH (p:P) RETURN properties(p) AS m
      """
    Then the result should be, in any order:
      | m             |
      | {a: 1, b: 'x'} |
