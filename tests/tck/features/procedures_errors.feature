Feature: CALL procedures and error surfaces

  Scenario: db.labels reflects labels added by writes
    Given an empty graph
    And having executed:
      """
      CREATE (:First), (:Second {v: 1})
      """
    When executing query:
      """
      CALL db.labels() YIELD label
      RETURN label ORDER BY label
      """
    Then the result should be, in order:
      | label    |
      | 'First'  |
      | 'Second' |

  Scenario: db.relationshipTypes reflects created relationship types
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:KNOWS]->(:B), (:A)-[:LIKES]->(:B)
      """
    When executing query:
      """
      CALL db.relationshipTypes() YIELD relationshipType
      RETURN relationshipType ORDER BY relationshipType
      """
    Then the result should be, in order:
      | relationshipType |
      | 'KNOWS'          |
      | 'LIKES'          |

  Scenario: db.propertyKeys lists node and relationship property keys
    Given an empty graph
    And having executed:
      """
      CREATE (:K {alpha: 1})-[:R {beta: 2}]->(:K)
      """
    When executing query:
      """
      CALL db.propertyKeys() YIELD propertyKey
      RETURN propertyKey ORDER BY propertyKey
      """
    Then the result should be, in order:
      | propertyKey |
      | 'alpha'     |
      | 'beta'      |

  Scenario: Unknown procedure raises an error
    Given an empty graph
    When executing query:
      """
      CALL db.nosuchproc() YIELD x RETURN x
      """
    Then an error should be raised

  Scenario: Unbalanced parenthesis is a syntax error
    Given an empty graph
    When executing query:
      """
      MATCH (n RETURN n
      """
    Then a SyntaxError should be raised

  Scenario: Unclosed string literal is a syntax error
    Given an empty graph
    When executing query:
      """
      RETURN 'abc
      """
    Then a SyntaxError should be raised

  Scenario: Dangling operator is a syntax error
    Given an empty graph
    When executing query:
      """
      RETURN 1 +
      """
    Then a SyntaxError should be raised

  Scenario: Aggregate inside WHERE is an error
    Given an empty graph
    When executing query:
      """
      MATCH (n:Any) WHERE count(n) > 1 RETURN n
      """
    Then a SyntaxError should be raised

  Scenario: rand inside an aggregate argument is an error
    Given an empty graph
    When executing query:
      """
      MATCH (n:Any) RETURN sum(rand()) AS s
      """
    Then a SyntaxError should be raised

  Scenario: Empty query text is a syntax error
    Given an empty graph
    When executing query:
      """

      """
    Then a SyntaxError should be raised

  Scenario: RETURN star with no variables in scope is a syntax error
    Given an empty graph
    When executing query:
      """
      RETURN *
      """
    Then a SyntaxError should be raised

  Scenario: Misspelled keyword is a syntax error
    Given an empty graph
    When executing query:
      """
      MACH (n) RETURN n
      """
    Then a SyntaxError should be raised
