Feature: List and pattern comprehension corner cases

  Scenario: Comprehension with filter only keeps the element
    Given an empty graph
    When executing query:
      """
      RETURN [x IN [1, 2, 3, 4] WHERE x % 2 = 0] AS evens
      """
    Then the result should be, in any order:
      | evens  |
      | [2, 4] |

  Scenario: Comprehension with map only transforms every element
    Given an empty graph
    When executing query:
      """
      RETURN [x IN [1, 2, 3] | x * x] AS squares
      """
    Then the result should be, in any order:
      | squares   |
      | [1, 4, 9] |

  Scenario: Comprehension over null list is null
    Given an empty graph
    When executing query:
      """
      WITH null AS l RETURN [x IN l | x] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: Comprehension over empty list is empty
    Given an empty graph
    When executing query:
      """
      RETURN [x IN [] WHERE x > 0 | x] AS v
      """
    Then the result should be, in any order:
      | v  |
      | [] |

  Scenario: Nested comprehension flattens inner results per element
    Given an empty graph
    When executing query:
      """
      RETURN [x IN [1, 2] | [y IN [10, 20] | x * y]] AS grid
      """
    Then the result should be, in any order:
      | grid                   |
      | [[10, 20], [20, 40]]   |

  Scenario: Comprehension filter referencing an outer variable
    Given an empty graph
    When executing query:
      """
      WITH 2 AS threshold
      RETURN [x IN [1, 2, 3] WHERE x > threshold | x] AS v
      """
    Then the result should be, in any order:
      | v   |
      | [3] |

  Scenario: Comprehension over a range with step
    Given an empty graph
    When executing query:
      """
      RETURN [x IN range(0, 10, 5) | x + 1] AS v
      """
    Then the result should be, in any order:
      | v          |
      | [1, 6, 11] |

  Scenario: Null elements survive the map stage
    Given an empty graph
    When executing query:
      """
      RETURN [x IN [1, null, 3] | x] AS v
      """
    Then the result should be, in any order:
      | v            |
      | [1, null, 3] |

  Scenario: Filter drops elements whose predicate is null
    Given an empty graph
    When executing query:
      """
      RETURN [x IN [1, null, 3] WHERE x > 1] AS v
      """
    Then the result should be, in any order:
      | v   |
      | [3] |

  Scenario: reduce with string accumulator
    Given an empty graph
    When executing query:
      """
      RETURN reduce(acc = '', s IN ['a', 'b', 'c'] | acc + s) AS joined
      """
    Then the result should be, in any order:
      | joined |
      | 'abc'  |

  Scenario: reduce seeds with the initial value on empty list
    Given an empty graph
    When executing query:
      """
      RETURN reduce(acc = 42, x IN [] | acc + x) AS v
      """
    Then the result should be, in any order:
      | v  |
      | 42 |

  Scenario: Pattern comprehension with WHERE filter
    Given an empty graph
    And having executed:
      """
      CREATE (a:Hub {n: 'h'})-[:R]->(:Leaf {v: 1}),
             (a)-[:R]->(:Leaf {v: 2}),
             (a)-[:R]->(:Leaf {v: 3})
      """
    When executing query:
      """
      MATCH (h:Hub)
      RETURN size([(h)-[:R]->(l) WHERE l.v > 1 | l.v]) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: Pattern comprehension on a node with no matches is empty
    Given an empty graph
    And having executed:
      """
      CREATE (:Hub {n: 'lonely'})
      """
    When executing query:
      """
      MATCH (h:Hub)
      RETURN [(h)-[:R]->(l) | l.v] AS vs
      """
    Then the result should be, in any order:
      | vs |
      | [] |

  Scenario: Quantifier ALL with null element is null unless decided
    Given an empty graph
    When executing query:
      """
      RETURN all(x IN [1, null] WHERE x > 0) AS a,
             any(x IN [1, null] WHERE x > 0) AS b,
             none(x IN [null, 0] WHERE x > 0) AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | null | true | null |

  Scenario: single is true for exactly one match
    Given an empty graph
    When executing query:
      """
      RETURN single(x IN [1, 2, 3] WHERE x = 2) AS s,
             single(x IN [2, 2] WHERE x = 2) AS d
      """
    Then the result should be, in any order:
      | s    | d     |
      | true | false |

  Scenario: Comprehension result used in arithmetic
    Given an empty graph
    When executing query:
      """
      RETURN reduce(acc = 0, x IN [x IN range(1, 5) WHERE x % 2 = 1 | x * 10] | acc + x) AS s
      """
    Then the result should be, in any order:
      | s  |
      | 90 |
