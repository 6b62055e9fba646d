Feature: Cross-type comparison and equality (reference src/db.ts:404-464 cypher_lt/gt
  orderability categories; deepCypherEquals src/db.ts:113-151)

  Scenario: Cross-type inequality comparisons are null
    Given an empty graph
    When executing query:
      """
      RETURN 1 < 'a' AS a, 'a' < 1 AS b, true < 1 AS c, 'x' > false AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |

  Scenario: Cross-type equality is false, not null
    Given an empty graph
    When executing query:
      """
      RETURN 1 = 'a' AS a, true = 'true' AS b, 1 = true AS c
      """
    Then the result should be, in any order:
      | a     | b     | c     |
      | false | false | false |

  Scenario: Integer and float are one number category for comparison
    Given an empty graph
    When executing query:
      """
      RETURN 1 < 1.5 AS a, 2.0 = 2 AS b, 3 >= 2.5 AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | true | true | true |

  Scenario: String comparison is lexicographic
    Given an empty graph
    When executing query:
      """
      RETURN 'apple' < 'banana' AS a, 'a' < 'ab' AS b, 'B' < 'a' AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | true | true | true |

  Scenario: Boolean comparison false before true
    Given an empty graph
    When executing query:
      """
      RETURN false < true AS a, true <= true AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | true | true |

  Scenario: List equality is element-wise deep
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] = [1, 2] AS a, [1, 2] = [1, 3] AS b, [1] = [1, 2] AS c
      """
    Then the result should be, in any order:
      | a    | b     | c     |
      | true | false | false |

  Scenario: List equality with null holes is null unless a mismatch decides
    Given an empty graph
    When executing query:
      """
      RETURN [1, null] = [1, null] AS a, [1, null] = [2, null] AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | null | false |

  Scenario: Empty lists are equal
    Given an empty graph
    When executing query:
      """
      RETURN [] = [] AS a
      """
    Then the result should be, in any order:
      | a    |
      | true |

  Scenario: Map equality compares keys and values
    Given an empty graph
    When executing query:
      """
      RETURN {a: 1, b: 2} = {b: 2, a: 1} AS a,
             {a: 1} = {a: 2} AS b,
             {a: 1} = {a: 1, b: 1} AS c
      """
    Then the result should be, in any order:
      | a    | b     | c     |
      | true | false | false |

  Scenario: Map equality with null values is null when keys match
    Given an empty graph
    When executing query:
      """
      RETURN {a: null} = {a: null} AS a, {a: null, b: 1} = {a: null, b: 2} AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | null | false |

  Scenario: Inequality of lists with same prefix
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] <> [1, 2] AS a, [1, 2] <> [1, 3] AS b
      """
    Then the result should be, in any order:
      | a     | b    |
      | false | true |

  Scenario: ORDER BY across mixed numeric types
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1.5, 2, 0.5] AS x
      RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x   |
      | 0.5 |
      | 1.5 |
      | 2   |
      | 3   |

  Scenario: ORDER BY puts nulls last ascending
    Given an empty graph
    When executing query:
      """
      UNWIND [2, null, 1] AS x
      RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x    |
      | 1    |
      | 2    |
      | null |

  Scenario: ORDER BY puts nulls first descending
    Given an empty graph
    When executing query:
      """
      UNWIND [2, null, 1] AS x
      RETURN x ORDER BY x DESC
      """
    Then the result should be, in order:
      | x    |
      | null |
      | 2    |
      | 1    |

  Scenario: Chained comparison is conjunction
    Given an empty graph
    When executing query:
      """
      RETURN 1 < 2 < 3 AS a, 1 < 3 < 2 AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |

  Scenario: Null-propagating chained comparison
    Given an empty graph
    When executing query:
      """
      RETURN 1 < null < 3 AS a
      """
    Then the result should be, in any order:
      | a    |
      | null |

  Scenario: Comparison of equal-length string and number lists mixes per element
    Given an empty graph
    When executing query:
      """
      RETURN ['a', 1] = ['a', 1] AS a, ['a', 1] = ['a', 2] AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |

  Scenario: Date compares to date
    Given an empty graph
    When executing query:
      """
      RETURN date('2024-01-01') < date('2024-06-01') AS a,
             date('2024-01-01') = date('2024-01-01') AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | true | true |

  Scenario: Property missing on one node compares as null
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a', age: 1}), (:P {name: 'b'})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.name AS name, p.age > 0 AS pos ORDER BY name
      """
    Then the result should be, in order:
      | name | pos  |
      | 'a'  | true |
      | 'b'  | null |

  Scenario: WHERE with null comparison filters the row out
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a', age: 1}), (:P {name: 'b'})
      """
    When executing query:
      """
      MATCH (p:P) WHERE p.age > 0 RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
