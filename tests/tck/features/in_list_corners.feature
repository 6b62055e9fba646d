Feature: IN operator three-valued logic and numeric unification

  Scenario: Integer found as float element
    Given an empty graph
    When executing query:
      """
      RETURN 1 IN [1.0] AS a, 1.0 IN [1] AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | true | true |

  Scenario: IN empty list is false even for null
    Given an empty graph
    When executing query:
      """
      RETURN null IN [] AS a, 1 IN [] AS b
      """
    Then the result should be, in any order:
      | a     | b     |
      | false | false |

  Scenario: Null element makes a miss unknown but not a hit
    Given an empty graph
    When executing query:
      """
      RETURN 1 IN [null, 1] AS hit, 2 IN [null, 1] AS miss
      """
    Then the result should be, in any order:
      | hit  | miss |
      | true | null |

  Scenario: Null left operand over a non-empty list is null
    Given an empty graph
    When executing query:
      """
      RETURN null IN [1, 2] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: IN over a null list is null
    Given an empty graph
    When executing query:
      """
      WITH null AS l RETURN 1 IN l AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: Plain miss is false
    Given an empty graph
    When executing query:
      """
      RETURN 2 IN [1, 3] AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |

  Scenario: String membership is exact and case sensitive
    Given an empty graph
    When executing query:
      """
      RETURN 'a' IN ['a', 'b'] AS hit, 'A' IN ['a'] AS miss
      """
    Then the result should be, in any order:
      | hit  | miss  |
      | true | false |

  Scenario: Cross-type membership is false
    Given an empty graph
    When executing query:
      """
      RETURN '1' IN [1, 2] AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |

  Scenario: Boolean membership
    Given an empty graph
    When executing query:
      """
      RETURN true IN [false, true] AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |

  Scenario: IN inside WHERE filters rows
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4] AS x
      WITH x WHERE x IN [2, 4]
      RETURN collect(x) AS l
      """
    Then the result should be, in any order:
      | l      |
      | [2, 4] |

  Scenario: NOT IN with null element stays null on a miss
    Given an empty graph
    When executing query:
      """
      RETURN NOT (2 IN [null, 1]) AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |

  Scenario: IN over a list built by a comprehension
    Given an empty graph
    When executing query:
      """
      RETURN 6 IN [x IN range(1, 10) | x * 2] AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |
