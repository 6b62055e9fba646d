Feature: Map literal and map value semantics

  Scenario: Nested map literal access
    Given an empty graph
    When executing query:
      """
      RETURN {a: {b: {c: 42}}}.a.b.c AS v
      """
    Then the result should be, in any order:
      | v  |
      | 42 |

  Scenario: Map literal with expression values
    Given an empty graph
    When executing query:
      """
      WITH 3 AS x RETURN {double: x * 2, label: 'v' + toString(x)}.double AS d
      """
    Then the result should be, in any order:
      | d |
      | 6 |

  Scenario: Dynamic key access with a computed string
    Given an empty graph
    When executing query:
      """
      WITH {alpha: 1, beta: 2} AS m, 'al' + 'pha' AS k RETURN m[k] AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: Missing key access yields null
    Given an empty graph
    When executing query:
      """
      WITH {a: 1} AS m RETURN m.nope AS v, m['also_nope'] AS w
      """
    Then the result should be, in any order:
      | v    | w    |
      | null | null |

  Scenario: Map equality is deep and order-insensitive
    Given an empty graph
    When executing query:
      """
      RETURN {a: 1, b: 2} = {b: 2, a: 1} AS eq, {a: 1} = {a: 2} AS ne
      """
    Then the result should be, in any order:
      | eq   | ne    |
      | true | false |

  Scenario: Map inequality on differing key sets
    Given an empty graph
    When executing query:
      """
      RETURN {a: 1} = {a: 1, b: 2} AS eq
      """
    Then the result should be, in any order:
      | eq    |
      | false |

  Scenario: keys of a map literal
    Given an empty graph
    When executing query:
      """
      WITH {z: 1, a: 2} AS m
      UNWIND keys(m) AS k
      RETURN k ORDER BY k
      """
    Then the result should be, in order:
      | k   |
      | 'a' |
      | 'z' |

  Scenario: size of keys counts entries
    Given an empty graph
    When executing query:
      """
      RETURN size(keys({a: 1, b: 2, c: 3})) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |

  Scenario: Map inside a list round trips
    Given an empty graph
    When executing query:
      """
      WITH [{name: 'x', v: 1}, {name: 'y', v: 2}] AS l
      UNWIND l AS m
      RETURN m.name AS name, m.v AS v ORDER BY v
      """
    Then the result should be, in order:
      | name | v |
      | 'x'  | 1 |
      | 'y'  | 2 |

  Scenario: Map with null value keeps the key
    Given an empty graph
    When executing query:
      """
      WITH {a: null, b: 1} AS m
      RETURN m.a AS a, size(keys(m)) AS n
      """
    Then the result should be, in any order:
      | a    | n |
      | null | 2 |

  Scenario: Accessing a property of null is null
    Given an empty graph
    When executing query:
      """
      WITH null AS m RETURN m.anything AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: Map values can be lists
    Given an empty graph
    When executing query:
      """
      WITH {xs: [1, 2, 3]} AS m RETURN m.xs[1] AS second, size(m.xs) AS n
      """
    Then the result should be, in any order:
      | second | n |
      | 2      | 3 |

  Scenario: Maps as UNWIND elements group correctly
    Given an empty graph
    When executing query:
      """
      UNWIND [{k: 'a'}, {k: 'a'}, {k: 'b'}] AS m
      RETURN m.k AS k, count(*) AS c ORDER BY k
      """
    Then the result should be, in order:
      | k   | c |
      | 'a' | 2 |
      | 'b' | 1 |

  Scenario: Equality between a map and a scalar is false
    Given an empty graph
    When executing query:
      """
      RETURN {a: 1} = 1 AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |

  Scenario: Nested map equality with inner list
    Given an empty graph
    When executing query:
      """
      RETURN {a: [1, 2], b: {c: 'x'}} = {b: {c: 'x'}, a: [1, 2]} AS eq
      """
    Then the result should be, in any order:
      | eq   |
      | true |
